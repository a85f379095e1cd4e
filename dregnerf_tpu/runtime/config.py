"""Flat argparse config shared by all four entry points.

Flag-for-flag parity with the reference parser (conerf/utils/config.py:
4-146) — same names, defaults, and semantics (seed 3407, aabb +-1.5,
factor 4, test_chunk_size 8192, sine/256 pos-emb, num_downsample 6,
n_tensorboard 30, n_validation 2500, n_checkpoint 5000) — plus a small
`tpu` group for the knobs that only exist on this side (sample budget /
packed-buffer size, max march steps, bf16 toggle, mesh shape).
"""
from __future__ import annotations

import argparse


def config_parser(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser()

    # base
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("--seed", type=int, default=3407)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--max_iterations", type=int, default=20000)
    parser.add_argument("--num_process", type=int, default=1)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--finetune", action="store_true")

    # dataset
    parser.add_argument(
        "--dataset",
        type=str,
        default="",
        choices=[
            "mipnerf_360", "nerf_llff_data", "nerf_synthetic", "objaverse",
            "scannerf", "Synthetic_NSVF", "Hypersim", "dtu", "BlendedMVS",
            "dnerf",
        ],
    )
    parser.add_argument("--json_dir", type=str, default="")
    parser.add_argument("--data_split_json", type=str, default="")
    parser.add_argument("--factor", type=int, default=4, choices=[1, 2, 4, 8])
    parser.add_argument("--train_split", type=str, default="trainval")
    parser.add_argument("--root_dir", type=str, default="")
    parser.add_argument("--scene", type=str, default="")
    parser.add_argument("--expname", type=str, default="chair_reg")
    parser.add_argument(
        "--aabb",
        type=lambda s: [float(item) for item in s.split(",")],
        default=[-1.5, -1.5, -1.5, 1.5, 1.5, 1.5],
    )
    parser.add_argument("--test_chunk_size", type=int, default=8192)
    parser.add_argument("--unbounded", action="store_true")
    parser.add_argument("--auto_aabb", action="store_true")
    parser.add_argument("--cone_angle", type=float, default=0.0)

    # multi blocks
    parser.add_argument("--multi_blocks", action="store_true")
    parser.add_argument("--fleet", action="store_true",
                        help="train all blocks concurrently, one per mesh "
                        "device (stage-1 fleet; implies fixed "
                        "--init_num_rays ray batches)")
    parser.add_argument("--num_blocks", type=int, default=3)
    parser.add_argument("--min_num_blocks", type=int, default=2)
    parser.add_argument("--max_num_blocks", type=int, default=4)

    # registration
    parser.add_argument("--position_embedding_type", type=str, default="sine")
    parser.add_argument("--position_embedding_dim", type=int, default=256)
    parser.add_argument("--position_embedding_scaling", type=float, default=1.0)
    parser.add_argument("--num_downsample", type=int, default=6)
    parser.add_argument("--robust_loss", action="store_true")
    parser.add_argument("--icp_refine", action="store_true",
                        help="polish predicted + classical poses with the "
                             "color-aware multi-start ICP at eval time "
                             "(reference refine_registration)")

    # checkpoints
    parser.add_argument("--ckpt_path", type=str, default="")
    parser.add_argument("--no_load_opt", action="store_true")
    parser.add_argument("--no_load_scheduler", action="store_true")

    # log/saving
    parser.add_argument("--enable_tensorboard", action="store_true")
    parser.add_argument("--enable_visdom", action="store_true",
                        help="start the live pose-visualization server "
                        "(hermetic visdom replacement, utils/pose_server.py)")
    parser.add_argument("--visdom_port", type=int, default=8097)
    parser.add_argument("--render_videos", action="store_true",
                        help="registration eval: render fused src/tgt "
                        "novel-view videos (gt/aligned/unaligned orbits)")
    parser.add_argument("--n_tensorboard", type=int, default=30)
    parser.add_argument("--n_validation", type=int, default=2500)
    parser.add_argument("--n_checkpoint", type=int, default=5000)

    # tpu-specific
    parser.add_argument("--reg_batch_size", type=int, default=1,
                        help="pairs per registration train step (vmapped; "
                        "the reference trains at batch 1)")
    parser.add_argument("--reg_device_cache", type=int, default=32,
                        help="voxel-grid blocks kept resident in HBM for "
                        "RegTr training (~60 MB each), with augmentation "
                        "applied in-jit; 0 = reference-style host path "
                        "(reload + re-upload per iteration)")
    parser.add_argument("--field", type=str, default="ngp",
                        choices=["ngp", "vanilla", "dnerf"],
                        help="radiance-field family (models/fields.py)")
    parser.add_argument("--out_dir", type=str, default="out",
                        help="output root (reference: out/<expname>)")
    parser.add_argument("--sample_budget", type=int, default=1 << 18,
                        help="packed sample-buffer capacity per step "
                        "(reference target_sample_batch_size)")
    parser.add_argument("--max_march_steps", type=int, default=1024,
                        help="static candidate steps per ray")
    parser.add_argument("--grid_resolution", type=int, default=128)
    parser.add_argument("--init_num_rays", type=int, default=256)
    parser.add_argument("--max_num_rays", type=int, default=1 << 16)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--no_bf16", dest="bf16", action="store_false")
    parser.add_argument("--grad_accum", type=str, default="bf16",
                        choices=["f32", "bf16", "sorted", "sorted_bf16",
                                 "pallas"],
                        help="NGP table-gradient scatter accumulator. "
                        "bf16 = tcnn-style reduced-precision "
                        "accumulation (the reference's own design; ~2.9x "
                        "faster scatter, 0.07 dB on the 1500-step gate). "
                        "f32 = exact accumulation via XLA scatter; "
                        "sorted/sorted_bf16 = argsort + indices_are_sorted "
                        "scatter (unserializes XLA's scatter loop — 503 M "
                        "rows/s vs 1.2 on random indices, "
                        "probe_pallas_scatter.py; 'sorted' keeps exact f32 "
                        "sums); pallas = exact f32 via the bucketed VMEM "
                        "kernel (ops/pallas_scatter.py).")
    parser.add_argument("--rle_backward", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="run-length-compress the table-gradient "
                        "scatter at coarse encoder levels (ops/rle.py; "
                        "ray-coherent samples repeat coarse cells, the "
                        "TPU scatter loop is per-row serial). In-graph "
                        "overflow fallback keeps it exact. Default on "
                        "(round-5 layout gate: L4F8_rle 191 s vs L4F8 "
                        "205 s / 2000 steps at equal-or-better val PSNR); "
                        "inert for unbounded scenes (nonlinear "
                        "contraction breaks the run-length model).")
    parser.add_argument("--march_compaction", type=str, default="capped",
                        choices=["compact", "capped", "quota", "rows"],
                        help="training marcher compaction. Default "
                        "'capped' = per-ray-cap packing (cap 512 — "
                        "content-identical to compact in practice, "
                        "tested, no global rank search); 'compact' = "
                        "reference-exact global cut")
    parser.add_argument("--val_fraction", type=float, default=0.2,
                        help="fraction of the val set per RegTr validation "
                        "(reference subsamples 20%%); use 1.0 on small "
                        "held-out sets so model_best selection is not a "
                        "1-pair draw of luck")
    parser.add_argument("--image_dispatch", type=str, default="scan",
                        choices=["scan", "hostloop"],
                        help="full-image render chunk execution: 'scan' = "
                        "one lax.map program; 'hostloop' = independent "
                        "per-chunk jit dispatches (raced on TPU by "
                        "scripts/perf/probe_render_dispatch.py)")
    parser.add_argument("--visibility", type=str, default="grid",
                        choices=["grid", "exact"],
                        help="registration GT overlap labels: 'grid' = "
                        "voxel-mask lookup (fast), 'exact' = march the "
                        "actual NeRF checkpoints per step (reference "
                        "confidence_loss.py semantics)")
    parser.add_argument("--vis_max_cameras", type=int, default=128,
                        help="static camera capacity for exact visibility")
    parser.add_argument("--vis_buffer_size", type=int, default=1 << 16,
                        help="packed sample capacity per camera pass in "
                        "exact visibility")
    parser.add_argument("--vis_cache_size", type=int, default=8,
                        help="device-resident NeRF-context LRU entries")
    parser.add_argument("--vis_exact_warped", action="store_true",
                        help="exact mode: also march the per-layer WARPED "
                        "keypoints for the (gradient-free) nerf-consistency "
                        "labels instead of the free voxel-mask lookup "
                        "(~7x slower; full reference logging parity)")
    parser.add_argument("--mesh_shape", type=str, default="",
                        help="device mesh, e.g. '4,2' for (data, model)")
    parser.add_argument("--compilation_cache", type=str,
                        default="/tmp/dregnerf_jax_cache")
    parser.add_argument("--watchdog_s", type=float, default=1200,
                        help="hang watchdog: hard-exit (code 86) if a "
                        "training heartbeat goes stale this long, so an "
                        "outer supervisor restarts + resumes from the "
                        "latest checkpoint (axon tunnel futex wedges — "
                        "CLAUDE.md). 0 disables. Size above worst-case "
                        "cold compile (~15 min uncached)")

    return parser.parse_args(argv)


def setup_jax(config) -> None:
    """Process-wide JAX setup: persistent compilation cache (first axon
    compile is minutes; the cache makes reruns instant)."""
    import jax

    if getattr(config, "compilation_cache", ""):
        try:
            jax.config.update("jax_compilation_cache_dir", config.compilation_cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
