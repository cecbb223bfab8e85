#!/bin/bash
# Probe the axon TPU every 4 min; on recovery run the priority TPU sequence:
# bench warm (guarantees BENCH_r03) -> kernel numerics -> SR e2e -> AP e2e.
cd /root/repo
for i in $(seq 1 60); do
  if timeout 300 python - <<'PY' > /tmp/tpu_probe.log 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print("TPU OK", float(x.sum()), jax.devices())
PY
  then
    echo "probe $i: TPU back at $(date)"
    break
  fi
  echo "probe $i: still down at $(date)"
  sleep 240
done
grep -q "TPU OK" /tmp/tpu_probe.log || { echo "GIVING UP"; exit 1; }
echo "=== bench warm ==="
timeout 2400 python bench.py > runs/logs/bench_r3.json 2> runs/logs/bench_r3.log \
  && echo "BENCH OK: $(cat runs/logs/bench_r3.json)" || echo "BENCH FAILED rc=$?"
echo "=== kernel numerics ==="
timeout 2400 python scripts/check_kernels_tpu.py > runs/logs/kernels.log 2>&1 \
  && echo "KERNELS OK" || echo "KERNELS FAILED rc=$?"
echo "=== SR e2e ==="
bash launch/e2e_synthetic_sr.sh > runs/logs/e2e_sr.log 2>&1 && echo "SR OK" || echo "SR FAILED rc=$?"
echo "=== AP e2e ==="
bash launch/e2e_synthetic_ap.sh > runs/logs/e2e_ap.log 2>&1 && echo "AP OK" || echo "AP FAILED rc=$?"
