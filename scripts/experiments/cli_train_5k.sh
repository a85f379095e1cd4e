#!/bin/bash
# VERDICT r3 #6 done-criterion: ONE unattended >=5k-step TPU run through
# the reference-parity CLI entry point (python train_ngp_nerf.py),
# completing end-to-end with the hang watchdog active (the round-3
# trainer.train() futex wedge is the failure this proves fixed).
# Reference loop being matched: conerf/base/trainer.py:161-246.
#
# Reuses the fleet's scene_00 renders when present (saves ~40 s of CPU
# raytracing); otherwise regenerates the identical fixture scene.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

DATA=/tmp/stage3_fleet/data
SCENE=scene_00
OUT=/tmp/cli5k
if [ ! -f "$DATA/$SCENE/transforms.json" ]; then
  echo "[cli5k] fleet data missing; generating the fixture scene"
  python - <<'EOF'
from dregnerf_tpu.datasets import fixtures
fixtures.make_scene("/tmp/stage3_fleet/data", num_views=100, image_size=192,
                    seed=0, name="scene_00",
                    spheres=fixtures.random_spheres(100))
EOF
fi

rm -rf "$OUT"
t0=$(date +%s)
python -u train_ngp_nerf.py --dataset objaverse --root_dir "$DATA" \
  --scene "$SCENE" --expname cli5k --out_dir "$OUT" \
  --factor 1 --aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0 \
  --max_iterations 5000 --sample_budget $((1<<17)) --max_march_steps 1024 \
  --grid_resolution 128 --init_num_rays 1024 --max_num_rays $((1<<15)) \
  --n_tensorboard 500 --n_validation 2500 --n_checkpoint 1000
rc=$?

python - "$rc" "$t0" <<'EOF'
import json, os, re, sys, time
rc, t0 = int(sys.argv[1]), int(sys.argv[2])
rec = {"rc": rc, "wall_s": int(time.time()) - t0, "iters": 5000,
       "entry": "python train_ngp_nerf.py (unattended, watchdog on)",
       "scene": "scene_00 (100 views x 192 px, 2^19 tables, 2^17 budget)"}
try:
    from dregnerf_tpu.runtime.checkpoint import load_checkpoint
    _, meta = load_checkpoint("/tmp/cli5k/cli5k/model/model.ckpt")
    rec["ckpt_step"] = int(meta.get("step", -1))
except Exception as e:
    rec["ckpt_error"] = str(e)[:200]
try:
    vals = re.findall(r"val/psnr ([0-9.]+)",
                      open("/tmp/cli5k/cli5k/log.txt").read())
    if vals:
        rec["val_psnr"] = float(vals[-1])
except Exception:
    pass
os.makedirs("experiments", exist_ok=True)
with open("experiments/cli_train_5k.json", "w") as f:
    json.dump(rec, f, indent=2)
print("[cli5k]", rec)
EOF

git add experiments/cli_train_5k.json
git commit -m "Evidence: unattended 5k-step CLI train run completes (watchdog)" \
    -- experiments/cli_train_5k.json
