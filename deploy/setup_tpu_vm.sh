#!/bin/bash
# Bring up splatloam_tpu on a Cloud TPU VM (single host or one host of a
# pod slice).  Deployment counterpart of the reference's docker/ scripts
# (which target CUDA containers); TPU VMs run bare-metal Python.
set -euo pipefail

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"

echo "== installing python deps =="
pip install -q -U "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install -q numpy pyyaml scipy rich pytest

echo "== building the native host runtime =="
make -C "${REPO_DIR}/native"

echo "== smoke test =="
cd "${REPO_DIR}"
python - <<'EOF'
import jax
print("devices:", jax.devices())
EOF
python -m pytest tests/test_pallas_raster.py -q

echo "== done =="
echo "Run SLAM:   python run.py slam configs/kitti/kitti-00-odom.yaml \\"
echo "              data.cloud_reader.cloud_folder=/data/kitti/00 \\"
echo "              data.trajectory_reader.filename=/data/kitti/poses/00.txt"
echo "Multi-host: start this on every host; jax.distributed is initialized"
echo "            automatically by the TPU runtime, and cfg parallel.data /"
echo "            parallel.model choose the mesh layout."
