"""Driver-contract guards: bench.py prints exactly one JSON line on stdout
with the required keys, and __graft_entry__ exposes entry()/dryrun_multichip.
These are the interfaces the round driver consumes — breaking them silently
would lose the round's benchmark."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_tiny_cpu_json_contract():
    out = subprocess.run(
        [sys.executable, "bench.py", "--cpu", "--tiny", "--trials", "2",
         "--batch", "4", "--repeats", "1"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {lines}"
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"] == "ensemble_inference_images_per_sec"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0


def test_graft_entry_contract():
    import jax

    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 2
    assert hasattr(g, "dryrun_multichip")


def test_dryrun_multichip_subprocess():
    """Run the multichip dryrun the way the driver does (subprocess, forced
    CPU device count)."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=REPO, timeout=560, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout
