#!/bin/bash
# Round-3 measurement driver: waits for the TPU to come back, then runs each
# measurement in its OWN process (a device fault poisons only that item).
export PYTHONPATH="/root/repo:$PYTHONPATH"
cd /root/repo
probe() { timeout 240 python -c "import jax,jax.numpy as jnp; jax.devices(); x=jnp.ones((128,128)); print(float((x@x).sum()))" >/dev/null 2>&1; }
wait_tpu() {
  for i in $(seq 1 60); do
    if probe; then echo "[driver] TPU alive"; return 0; fi
    echo "[driver] TPU unavailable, retry $i/60 in 120s"; sleep 120
  done
  return 1
}
for item in "$@"; do
  wait_tpu || { echo "[driver] giving up: TPU never came back"; exit 1; }
  echo "[driver] === $item ==="
  timeout 5400 python tools/measure_r3.py "$item"
  echo "[driver] $item rc=$?"
done
echo "[driver] all done"
