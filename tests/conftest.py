"""Test env: force an 8-device virtual CPU mesh BEFORE jax import so
multi-chip sharding paths are testable without TPUs (SURVEY §4 implication)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers an axon TPU backend and pins
# jax_platforms to "axon,cpu" — re-pin to cpu so tests never ride the tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Single-core box: suite wall time is XLA-compile-dominated. Persist CPU
# compiles across runs (keyed by HLO hash, so code changes invalidate
# exactly the programs they touch) — a repeat full-suite run drops from
# compile-bound to execute-bound. Opt out with ASTTTS_TEST_NO_CACHE=1.
#
# The cache dir is suffixed with a host-CPU-feature fingerprint: XLA:CPU AOT
# artifacts bake in the compile machine's vector ISA, and this jax version
# happily LOADS an artifact built on a different host (it warns about
# feature mismatch, then can SIGSEGV/SIGILL mid-suite — observed when a
# cache built on an avx512 box was reused elsewhere). A per-host dir makes
# stale foreign artifacts unreachable instead of fatal.


def _host_cpu_tag() -> str:
    # Hash the model identity lines TOO, not just the flags line: LLVM picks
    # tuning features per CPU *model* (e.g. +prefer-no-gather on gather-bug
    # steppings), so two hosts with identical flags lines can still produce
    # mutually fatal AOT artifacts.
    import hashlib
    import platform

    keys = ("flags", "Features", "model name", "model", "stepping", "vendor_id")
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(keys):
                    lines.append(line)
                if line.strip() == "" and lines:
                    break  # first core only; all cores are identical
    except OSError:
        pass
    if lines:
        return hashlib.sha1("".join(lines).encode()).hexdigest()[:10]
    return platform.machine() or "unknown"


if os.environ.get("ASTTTS_TEST_NO_CACHE", "0") != "1":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "ASTTTS_TEST_CACHE_DIR",
            f"/tmp/asttts_cpu_jax_cache_{_host_cpu_tag()}",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Anything not marked slow is the fast tier: `pytest -m fast` is the
    ~3-min iteration loop, the full run stays the CI gate (VERDICT r3 #7)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def mesh8():
    from autostyle_tts_tpu.parallel.mesh import make_mesh

    return make_mesh(data=4, model=2)


@pytest.fixture(scope="session")
def tiny_cfg():
    from autostyle_tts_tpu.utils.config import tiny_config

    return tiny_config()
