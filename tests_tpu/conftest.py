"""On-TPU test tier (SURVEY §4's missing top layer; VERDICT r1 #4).

Unlike ``tests/`` (which forces CPU with 8 fake devices and runs every Pallas
kernel in interpret mode), this directory runs against the REAL chip with
compiled Mosaic kernels — the only place Mosaic-specific miscompiles can
surface. Run it on the bench chip with:

    python -m pytest tests_tpu -q          # or: -m tpu

Keep it minutes-sized: every distinct jit shape is a ~30-40 s remote compile
on this relay, so tests share module-scoped models/params and reuse shapes.
Only one TPU client can hold the chip at a time — don't run in parallel with
bench.py or another test session.
"""

import pytest

import jax

collect_ignore: list = []


def pytest_collection_modifyitems(items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("tests_tpu needs the real TPU backend", allow_module_level=True)
