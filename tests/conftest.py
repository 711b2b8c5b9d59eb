from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eth_options_data_pipeline_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"

# Suite scratch rides tmpfs when available: streaming checkpoints,
# scratch sinks, and shuffle spill are many small fsync-bound writes,
# and /tmp is disk-backed ext4 on this box while /dev/shm is RAM.
# Data volumes are tiny (sf0.001/sf0.01), so RAM is safe. All three
# scratch roots move together: pytest's tmp_path (--basetemp), the
# package faces' tempfile.gettempdir() landings, and Spark's local
# dirs. Falls back to the normal defaults when /dev/shm is absent.
_SHM = "/dev/shm"


def pytest_configure(config):
    if os.path.isdir(_SHM) and config.option.basetemp is None:
        import tempfile

        # Per-run component (PID) so two concurrent pytest runs on the
        # same box never clobber each other's basetemp / Spark local
        # dirs; pytest_unconfigure removes the tree so per-face scratch
        # (qx46/qx47/qx51-style) can't accumulate in RAM (ADVICE r09).
        base = os.path.join(_SHM, f"spark-graft-pytest-{os.getpid()}")
        config.option.basetemp = os.path.join(base, "tmp_path")
        scratch = os.path.join(base, "scratch")
        os.makedirs(scratch, exist_ok=True)
        os.environ["TMPDIR"] = scratch
        tempfile.tempdir = scratch
        config._spark_graft_scratch_root = base


def pytest_unconfigure(config):
    root = getattr(config, "_spark_graft_scratch_root", None)
    if root and os.path.isdir(root):
        import shutil

        shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="session")
def spark():
    extra = {}
    if os.path.isdir(_SHM):
        local_dir = os.path.join(
            _SHM, f"spark-graft-pytest-{os.getpid()}", "spark-local")
        os.makedirs(local_dir, exist_ok=True)
        extra["spark.local.dir"] = local_dir
    # local[16]: plan shapes depend on shuffle_partitions /
    # default.parallelism (both pinned at 8), never on thread count,
    # so extra threads only cut wall time on the CPU-bound sweeps.
    spark = get_spark(app_name="engine-tests", master="local[16]",
                      shuffle_partitions=8, extra_conf=extra)
    yield spark


@pytest.fixture()
def stream_parts(spark):
    """Suite-budget lever for stateful-stream tests (r13 trim): a
    streaming query instantiates one state-store task per
    spark.sql.shuffle.partitions per micro-batch, and the semantics
    under test (watermarks, timeouts, replay idempotence, crash
    recovery) are partition-count-independent — 2 keeps the
    multi-partition state path exercised while dropping 6 idle
    state tasks per batch. The conf is scoped to the test: partition
    count is read at QUERY START, so restoring it after the test
    leaves every other plan at the session's pinned 8."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield spark
    spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium():
    return SF_MEDIUM


@pytest.fixture(scope="session")
def all_plans_raw(spark, sf_small):
    """One physical-plan compile per registered face, shared by the
    early compile tripwire (test_all_faces_compile.py) AND every
    registry-wide plan sweep in test_plans.py. Compiling all faces
    costs ~25s once per session; capturing per-face exceptions here
    means an operator API drift fails test_all_faces_compile with the
    face's NAME instead of erroring unrelated sweeps at fixture setup
    (VERDICT r07 item 5 — the dx26 lesson)."""
    from concurrent.futures import ThreadPoolExecutor

    from eth_options_data_pipeline_spark.queries import REGISTRY

    def compile_one(item):
        name, spec = item
        try:
            df = spec.fn(spark, sf_small)
            # the DataFrame rides along so the sf0.001 oracle-parity
            # sweep can reuse it instead of re-constructing every face
            # (construction + analysis is ~0.3s x 120+ faces)
            return name, (df, df._jdf.queryExecution().executedPlan().toString(), None)
        except Exception as exc:  # noqa: BLE001 — reported by name in the tripwire;
            # KeyboardInterrupt/SystemExit must abort the session, not be
            # recorded as a per-face compile failure (ADVICE r08)
            return name, (None, None, exc)

    # 16 compile threads (r11 suite-budget cut: 57s serial -> ~15s;
    # widened 8 -> 16 r14 — on a contended box the 8-pool read 46s
    # because individual compiles stall on the busy JVM, and more
    # in-flight compiles hide those stalls): py4j's gateway is
    # thread-safe, Catalyst analysis happens JVM-side per-thread, and
    # the eager faces' scratch dirs are per-face so concurrent
    # construction never collides. Results keyed by name, so
    # completion order is irrelevant.
    with ThreadPoolExecutor(max_workers=16) as pool:
        return dict(pool.map(compile_one, REGISTRY.items()))
