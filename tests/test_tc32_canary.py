"""tc=32 Mosaic-miscompile canary (VERDICT r4 #9).

The fused hier scan kernel silently corrupts a handful of output rows at
tc=32 row-blocks on TPU v5e (PERF.md round 3b; standalone repro
tools/tc32_repro.py, upstream writeup tools/ISSUE_tc32.md — to be filed
when egress exists).  tc=32 is blacklisted in the autotuner and warned
about in retrieve_hier; this canary runs the repro on the real chip as an
EXPECTED FAILURE so a toolchain bump that fixes the miscompile flips it
to XPASS (strict xfail -> suite failure) and gets noticed — the signal to
un-blacklist tc=32 (~2% scan win) and drop the warning.

Runs in a subprocess with the test env's CPU forcing stripped (conftest
pins pytest to CPU; the miscompile is Mosaic-on-TPU only) and SKIPs when
no TPU is reachable, so CPU-only CI is unaffected.
"""

import os
import subprocess
import sys

import pytest

_REPRO = os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                      "tc32_repro.py")


def _tpu_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    return env


@pytest.mark.xfail(
    strict=True,
    reason="Mosaic tc=32 miscompile (tools/ISSUE_tc32.md) — XPASS here "
    "means a toolchain bump fixed it: file no longer needed upstream, "
    "un-blacklist tc=32 in ops/autotune.py and retrieve_hier's warning")
def test_tc32_scan_blocks_not_corrupt_on_tpu():
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; assert jax.default_backend() == 'tpu'"],
        env=_tpu_env(), capture_output=True, timeout=120)
    if probe.returncode != 0:
        pytest.skip("no TPU reachable — the tc=32 miscompile is "
                    "Mosaic-on-TPU only")
    # 2 trials hit the corruption reliably at the production geometry
    # (deterministic within a few trials per the repro's measurements);
    # exit 1 = corrupt (the current, expected state)
    r = subprocess.run(
        [sys.executable, _REPRO, "--trials", "2"], env=_tpu_env(),
        capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, (
        f"tc=32 corrupt (expected while the Mosaic bug stands):\n{r.stdout}")
