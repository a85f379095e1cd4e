"""Runtime auxiliary subsystems: profiling, logging, checkpoint manager."""
import os
import time

import numpy as np
import pytest

from dregnerf_tpu.runtime.checkpoint import CheckpointManager
from dregnerf_tpu.runtime.logging import ScalarLogger
from dregnerf_tpu.runtime.profiling import PhaseTimer


class TestPhaseTimer:
    def test_accumulates(self):
        t = PhaseTimer()
        with t.phase("a"):
            time.sleep(0.01)
        with t.phase("a"):
            time.sleep(0.01)
        with t.phase("b"):
            pass
        assert t.counts["a"] == 2
        assert t.totals["a"] >= 0.02
        s = t.summary()
        assert "a" in s and "b" in s
        t.reset()
        assert not t.totals


class TestScalarLogger:
    def test_text_mirror(self, tmp_path):
        path = str(tmp_path / "log.txt")
        logger = ScalarLogger(str(tmp_path / "tb"), text_path=path)
        logger.log_scalars(5, {"loss": 0.25, "psnr": 30.0})
        logger.close()
        content = open(path).read()
        assert "step 5" in content and "loss 0.25" in content

    def test_tensorboard_writer(self, tmp_path):
        logger = ScalarLogger(str(tmp_path / "tb"), enable_tensorboard=True)
        if logger.writer is None:
            pytest.skip("tensorboardX unavailable")
        logger.log_scalars(1, {"x": 1.0})
        logger.log_image(1, "img", np.zeros((4, 4, 3), np.float32))
        logger.close()
        files = os.listdir(str(tmp_path / "tb"))
        assert any("tfevents" in f for f in files)


class TestCheckpointRetention:
    def test_max_to_keep_gc(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
        state = {"m": {"w": np.ones(3)}}
        for step in (1, 2, 3, 4):
            mgr.save(step, state, {"note": "x"}, score=float(step))
        files = sorted(os.listdir(str(tmp_path)))
        stamped = [f for f in files if f.startswith("model_0")]
        assert len(stamped) == 2  # only the last two kept
        assert "model.ckpt" in files and "model_best.ckpt" in files
        # registry lists the kept ones
        reg = open(tmp_path / "checkpoints.txt").read()
        assert "model_000004.ckpt" in reg

    def test_best_tracking(self, tmp_path):
        from dregnerf_tpu.runtime.checkpoint import load_checkpoint

        mgr = CheckpointManager(str(tmp_path))
        mgr.save(1, {"m": {"w": np.full(2, 1.0)}}, {}, score=5.0)
        mgr.save(2, {"m": {"w": np.full(2, 2.0)}}, {}, score=3.0)  # worse
        flat, meta = load_checkpoint(str(tmp_path / "model_best.ckpt"))
        assert meta["step"] == 1
        np.testing.assert_allclose(flat["m::w"], 1.0)

    def test_latest_step(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        assert mgr.latest_step() is None
        mgr.save(7, {"m": {"w": np.ones(1)}}, {})
        assert mgr.latest_step() == 7

    def test_load_accepts_directory_path(self, tmp_path):
        """--ckpt_path pointing at the model DIRECTORY resolves to its
        model.ckpt (np.load on a directory would raise otherwise —
        round-4 visibility_effect latent crash)."""
        mgr = CheckpointManager(str(tmp_path / "run" / "model"))
        mgr.save(3, {"m": {"w": np.full(2, 4.0)}}, {})
        other = CheckpointManager(str(tmp_path / "elsewhere"))
        loaded = other.load(
            {"m": {"w": np.zeros(2)}}, path=str(tmp_path / "run" / "model")
        )
        assert loaded is not None
        state, meta = loaded
        assert meta["step"] == 3
        np.testing.assert_allclose(state["m"]["w"], 4.0)

    def test_best_survives_restart_and_scoreless_saves(self, tmp_path):
        """best_score persists across manager restarts (supervised fleets
        kill+restart trainers), and score=None saves (failure path) never
        touch model_best.ckpt — RegTr scores are -RRE (negative), so a
        0.0 default would otherwise claim best permanently."""
        from dregnerf_tpu.runtime.checkpoint import load_checkpoint

        mgr = CheckpointManager(str(tmp_path))
        mgr.save(1, {"m": {"w": np.full(2, 1.0)}}, {}, score=-2.0)
        # fresh manager in the same dir = process restart
        mgr2 = CheckpointManager(str(tmp_path))
        assert mgr2.best_score == -2.0
        mgr2.save(2, {"m": {"w": np.full(2, 2.0)}}, {}, score=-5.0)  # worse
        mgr2.save(3, {"m": {"w": np.full(2, 3.0)}}, {}, score=None)  # failure
        _, meta = load_checkpoint(str(tmp_path / "model_best.ckpt"))
        assert meta["step"] == 1
        mgr2.save(4, {"m": {"w": np.full(2, 4.0)}}, {}, score=-1.0)  # better
        _, meta = load_checkpoint(str(tmp_path / "model_best.ckpt"))
        assert meta["step"] == 4


class TestResilience:
    def test_transient_classification(self):
        from dregnerf_tpu.runtime.resilience import is_transient

        assert is_transient(RuntimeError("http: Broken pipe (os error 32)"))
        assert is_transient(RuntimeError("UNAVAILABLE: transport closed"))
        assert not is_transient(ValueError("shape mismatch"))

    def test_retries_then_succeeds(self):
        from dregnerf_tpu.runtime.resilience import run_with_retries

        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("Network Error: Broken pipe")
            return 42

        assert run_with_retries(flaky, backoff_s=0.0) == 42
        assert calls["n"] == 3

    def test_fatal_invokes_on_failure(self):
        from dregnerf_tpu.runtime.resilience import run_with_retries

        saved = {}

        def fatal():
            raise ValueError("real bug")

        with pytest.raises(ValueError):
            run_with_retries(
                fatal, backoff_s=0.0,
                on_failure=lambda exc: saved.setdefault("exc", str(exc)),
            )
        assert "real bug" in saved["exc"]

    def test_guard_nans(self):
        from dregnerf_tpu.runtime.resilience import guard_nans

        guard_nans({"a": np.ones(3)}, "ok")
        with pytest.raises(FloatingPointError):
            guard_nans({"a": np.array([1.0, np.nan])}, "bad")

    def test_watchdog_beat_keeps_alive(self):
        from dregnerf_tpu.runtime.resilience import Watchdog

        import time as _t

        with Watchdog(timeout_s=2.0, name="test") as wd:
            for _ in range(4):
                _t.sleep(0.3)
                wd.beat()
        # exiting the context stops the thread; still alive == pass

    def test_watchdog_disabled_noop(self):
        from dregnerf_tpu.runtime.resilience import Watchdog

        with Watchdog(timeout_s=0, name="off") as wd:
            wd.beat()

    def test_watchdog_fires_in_subprocess(self):
        """A stale heartbeat hard-exits with the watchdog's code (86) so
        an outer supervisor restarts + resumes from checkpoint — the only
        recovery for the futex-wedge failure mode (CLAUDE.md round 3)."""
        import subprocess
        import sys

        code = (
            "from dregnerf_tpu.runtime.resilience import Watchdog\n"
            "import time\n"
            "with Watchdog(timeout_s=1.0, name='sub') as wd:\n"
            "    time.sleep(30)\n"  # never beats -> watchdog fires
            "print('should not reach here')\n"
        )
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=25,
            text=True,
        )
        assert r.returncode == Watchdog_exit_code()
        assert "no heartbeat" in r.stdout


def Watchdog_exit_code():
    from dregnerf_tpu.runtime.resilience import Watchdog

    return Watchdog.EXIT_CODE


def test_export_reference_pth(tmp_path):
    """npz checkpoint -> reference-style flat model.pth (torch dict with
    the reference's meta keys + model/occupancy tensors)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.ops.hash_encoding import HashGridConfig
    from dregnerf_tpu.runtime.checkpoint import save_checkpoint
    from dregnerf_tpu.runtime.export_torch import export_reference_pth

    cfg = ngp.NGPConfig(grid=HashGridConfig(n_levels=2, log2_table_size=8),
                        compute_dtype=jnp.float32)
    params = ngp.init_ngp(jax.random.PRNGKey(0), cfg)
    meta = {
        "step": 42, "field": "ngp", "aabb": [-1, -1, -1, 1, 1, 1],
        "unbounded": False, "grid_resolution": 16,
        "contraction_type": "aabb", "near_plane": 0.0, "far_plane": 1e10,
        "render_step_size": 0.01, "alpha_thre": 0.0, "cone_angle": 0.0,
        "camera_poses": np.eye(4)[None].tolist(), "block_id": 1,
        "model_config": ngp.config_to_meta(cfg),
    }
    src = str(tmp_path / "model.ckpt")
    save_checkpoint(src, {"model": params, "occupancy": {
        "occs": jnp.zeros(16**3), "binary": jnp.zeros((16,) * 3, bool)}}, meta)
    out = export_reference_pth(src)
    d = torch.load(out, weights_only=False)
    assert d["step"] == 42 and d["block_id"] == 1
    assert d["contraction_type"] == "aabb"
    assert "occupancy_grid" in d and "binary" in d["occupancy_grid"]
    got = d["model"]["table"].numpy()
    np.testing.assert_allclose(got, np.asarray(params["table"]))


def test_pose_viz_server_round_trip():
    """The hermetic visdom replacement: frusta math + HTTP state serving
    (reference conerf/visualization/pose_visualizer.py:11-152)."""
    import json
    import urllib.request

    import numpy as np

    from dregnerf_tpu.utils.pose_server import (PoseVizServer,
                                                camera_wireframes,
                                                point_trace,
                                                visualize_cameras)

    # identity pose: optical center at origin, image plane at z=depth
    wires = camera_wireframes(np.eye(4), depth=2.0)
    assert wires.shape == (1, 10, 3)
    np.testing.assert_allclose(wires[0, 5], np.zeros(3))  # center vertex
    assert np.allclose(wires[0, 0], [-1.0, -1.0, 2.0])

    # a translated 3x4 pose shifts every vertex
    pose = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], 1)
    w2 = camera_wireframes(pose, depth=2.0)
    np.testing.assert_allclose(w2[0] - wires[0], np.tile([1, 2, 3], (10, 1)))

    server = PoseVizServer(port=0)
    try:
        visualize_cameras(
            server, step=7, poses=[np.eye(4)[None], pose[None]],
            extra_traces=[point_trace(np.random.rand(2000, 3), "#999")],
        )
        url = f"http://127.0.0.1:{server.port}"
        state = json.loads(urllib.request.urlopen(f"{url}/state.json").read())
        assert state["step"] == 7
        kinds = [t["kind"] for t in state["traces"]]
        assert kinds.count("lines") == 3  # 2 frusta sets + distance segs
        assert kinds.count("points") == 1
        assert len(state["traces"][0]["points"]) == 800  # subsampled cloud
        html = urllib.request.urlopen(f"{url}/").read().decode()
        assert "state.json" in html and "canvas" in html
    finally:
        server.close()
