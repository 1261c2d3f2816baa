"""The e32f driver-session contract, proven end-to-end: a FOREIGN
SparkSession — built BEFORE this package is imported, with the vendored
protobuf shim absent from the launch ``PYTHONPATH`` (exactly the
correctness driver's launch order) — must still be able to run
``transformWithStateInPandas``, because :func:`tws_runnable`
self-provisions the shim as a usersite ``.pth`` that the JVM-spawned
state worker picks up via normal ``site`` processing.

Runs in a subprocess so the launch order and env are really foreign, not
simulated.  Reference for the state machine being certified:
``src/qp/operators/Distinct.java``-style single-pass state folding has no
Java twin — this is the Spark 4 stateful API surface (SURVEY §2 streaming
rows), certified here without ``get_spark``'s pre-launch export.
"""

from __future__ import annotations

import os
import site
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FOREIGN_SCRIPT = """
import os

# Driver launch order: SparkSession FIRST, package import AFTER — the JVM
# launches without the shim on PYTHONPATH.
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("tws_foreign")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spj_query_engine_spark.streaming import stateful

assert stateful.tws_runnable(spark), (
    "tws_runnable is False on a foreign session - usersite provisioning "
    "did not take"
)
stateful.ensure_protobuf(spark)
df = stateful.run_tws_running_totals(spark, os.environ["SPJ_TEST_SF_DIR"])
n = df.count()
assert n > 0, "TWS query returned no rows"
print("TWS_FOREIGN_OK", n)
"""


def test_tws_runnable_on_foreign_session_without_env():
    from spj_query_engine_spark.streaming import stateful

    # prove provisioning from scratch: drop any pre-existing .pth
    pth = os.path.join(site.getusersitepackages(), stateful.USERSITE_PTH_NAME)
    if os.path.exists(pth):
        os.remove(pth)

    env = dict(os.environ)
    shim_abs = os.path.abspath(stateful.PROTOSHIM_DIR)
    parts = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != shim_abs
    ]
    # the package itself must stay importable in the subprocess
    if REPO not in parts:
        parts.insert(0, REPO)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["SPJ_TEST_SF_DIR"] = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )

    r = subprocess.run(
        [sys.executable, "-c", FOREIGN_SCRIPT],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, (
        f"foreign-session TWS run failed\nstdout:\n{r.stdout[-4000:]}\n"
        f"stderr:\n{r.stderr[-4000:]}"
    )
    assert "TWS_FOREIGN_OK" in r.stdout
    # the provisioning really used the usersite channel on this container
    # (unless a real protobuf exists, in which case no .pth is needed)
    try:
        import google.protobuf as _gp

        real = not os.path.abspath(_gp.__file__).startswith(shim_abs + os.sep)
    except ImportError:
        real = False
    if not real:
        assert os.path.exists(pth), "usersite .pth was not written"
