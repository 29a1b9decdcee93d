"""Test configuration: force the CPU backend with 8 virtual devices so the
whole suite (including multi-chip sharding tests) runs anywhere, per
SURVEY.md §4's backend-equivalence strategy. Must run before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# ambient TPU plugins (axon) can override JAX_PLATFORMS; pin via config too
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cube_scene():
    import raytpu

    return raytpu.load_scene("/root/reference/cube.glb")


@pytest.fixture(scope="session")
def cube_camera():
    import raytpu

    return raytpu.load_camera_json("/root/reference/camera.json", 64, 64)


def isolated(fn):
    """Run the decorated test in a CHILD pytest process.

    XLA:CPU's compiler segfaults flakily when a large interpret-mode
    Pallas program compiles late in a long single-process suite
    (observed at test_strand's persistent/ribbon equivalence tests in
    full r5 runs; the same compiles are always clean in a fresh
    process). The child gets a fresh process, a crashed child (negative
    returncode) is retried once, and a real test failure in the child
    (rc 1) is reported as a normal assertion — a compiler crash can no
    longer kill the whole suite."""
    import functools
    import os as _os
    import subprocess
    import sys as _sys

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _os.environ.get("RAYTPU_TEST_CHILD"):
            return fn(*args, **kwargs)
        cur = _os.environ.get("PYTEST_CURRENT_TEST", "")
        test_id = cur.rsplit(" ", 1)[0]
        assert "::" in test_id, f"no test id in {cur!r}"
        env = dict(_os.environ, RAYTPU_TEST_CHILD="1")
        r = None
        for _attempt in (1, 2):
            r = subprocess.run(
                [_sys.executable, "-m", "pytest", "-q",
                 "-p", "no:cacheprovider", test_id],
                env=env, capture_output=True, text=True, timeout=1800,
                cwd=_os.path.dirname(_os.path.dirname(
                    _os.path.abspath(__file__))),
            )
            if r.returncode == 0:
                return None
            if r.returncode == 1:  # real failure, not a crash
                break
        raise AssertionError(
            f"isolated child rc={r.returncode}\n"
            f"{r.stdout[-3000:]}\n{r.stderr[-1500:]}"
        )

    return wrapper
