#!/bin/bash
# CI entry (the reference gates on compile + GPU-cluster E2E,
# reference test/CI.DockerFile + .gitlab-ci.yml; here: native build, unit+e2e
# suite on the virtual CPU mesh, examples, bench smoke).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build"
make -C hugectr_backend_tpu/native

echo "== tests"
python -m pytest tests/ -q

echo "== examples"
for e in examples/*.py; do
  echo "-- $e"
  python "$e" > /dev/null
done

echo "== graft entry (8-dev virtual mesh)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
fn(*args)
g.dryrun_multichip(8)
print("graft entry ok")
EOF

echo "== bench smoke"
HPS_BENCH_SMOKE=1 python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import bench
bench.main()
EOF

echo "CI OK"
