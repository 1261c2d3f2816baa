"""The e32f driver-session contract, proven end-to-end: a FOREIGN
SparkSession — built BEFORE this package is imported, with the vendored
protobuf shim absent from the launch ``PYTHONPATH`` (exactly the
correctness driver's launch order) — must still be able to run
``transformWithStateInPandas``, because :func:`tws_runnable`
self-provisions the shim as a usersite ``.pth`` that the JVM-spawned
state worker picks up via normal ``site`` processing.

Runs in a subprocess so the launch order and env are really foreign, not
simulated — and under a SCRATCH ``PYTHONUSERBASE``, so the test exercises
the full provisioning lifecycle (atomic write, in-run visibility, atexit
removal) without ever mutating the developer's real usersite.  Reference
for the state machine being certified:
``src/qp/operators/Distinct.java``-style single-pass state folding has no
Java twin — this is the Spark 4 stateful API surface (SURVEY §2 streaming
rows), certified without ``get_spark``'s pre-launch export.
"""

from __future__ import annotations

import os
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
pth = stateful._usersite_pth_path()
if pth and os.path.exists(pth):
    print("PTH_PRESENT_DURING_RUN", pth)
print("TWS_FOREIGN_OK", n)
"""


def _foreign_env(scratch_userbase: str) -> dict:
    from spj_query_engine_spark.streaming import stateful

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
    # scratch usersite: site.getusersitepackages() honors PYTHONUSERBASE,
    # and the JVM-spawned workers inherit it, so the whole provisioning
    # lifecycle runs against a directory this test owns
    env["PYTHONUSERBASE"] = scratch_userbase
    return env


def _scratch_pth(scratch_userbase: str) -> str:
    from spj_query_engine_spark.streaming import stateful

    v = f"python{sys.version_info.major}.{sys.version_info.minor}"
    return os.path.join(
        scratch_userbase, "lib", v, "site-packages", stateful.USERSITE_PTH_NAME
    )


def test_tws_runnable_on_foreign_session_without_env(tmp_path):
    from spj_query_engine_spark.streaming import stateful

    scratch = str(tmp_path / "userbase")
    r = subprocess.run(
        [sys.executable, "-c", FOREIGN_SCRIPT],
        env=_foreign_env(scratch),
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
    # lifecycle: if the usersite channel was used (no real protobuf on the
    # container), the .pth was present DURING the run and atexit-removed
    # at process exit — the host is left exactly as found
    try:
        import google.protobuf as _gp

        shim_abs = os.path.abspath(stateful.PROTOSHIM_DIR)
        real = not os.path.abspath(_gp.__file__).startswith(shim_abs + os.sep)
    except ImportError:
        real = False
    if not real:
        assert "PTH_PRESENT_DURING_RUN" in r.stdout, (
            "usersite .pth was not written during the run"
        )
        assert not os.path.exists(_scratch_pth(scratch)), (
            "provisioned .pth survived process exit — atexit cleanup "
            "did not run"
        )


def test_real_protobuf_wins_and_retires_shim(tmp_path, monkeypatch):
    """When a REAL protobuf distribution resolves (probed with -s, i.e.
    without usersite), provisioning must not write a .pth — and must
    REMOVE a leftover shim .pth of ours on the spot, so a later
    `pip install protobuf` wins immediately instead of being masked."""
    import site

    from spj_query_engine_spark.streaming import stateful

    # scratch usersite visible to both this process (_usersite_pth_path)
    # and the fresh-interpreter probes (PYTHONUSERBASE)
    scratch_site = tmp_path / "userbase" / "site-packages"
    scratch_site.mkdir(parents=True)
    monkeypatch.setattr(site, "ENABLE_USER_SITE", True)
    monkeypatch.setattr(site, "USER_SITE", str(scratch_site))
    monkeypatch.setenv("PYTHONUSERBASE", str(tmp_path / "userbase"))

    # a fake REAL protobuf on PYTHONPATH (the probe strips only the shim)
    fake = tmp_path / "fakedist"
    (fake / "google" / "protobuf").mkdir(parents=True)
    (fake / "google" / "__init__.py").write_text(
        "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
    )
    (fake / "google" / "protobuf" / "__init__.py").write_text("")
    monkeypatch.setenv(
        "PYTHONPATH",
        str(fake) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )

    # a leftover shim .pth of OURS in the scratch usersite
    pth = scratch_site / stateful.USERSITE_PTH_NAME
    pth.write_text(os.path.abspath(stateful.PROTOSHIM_DIR) + "\n")

    monkeypatch.setattr(stateful, "_USERSITE_PROVISIONED", None)
    assert stateful.provision_usersite_shim() is True
    assert not pth.exists(), (
        "real-protobuf-wins: leftover shim .pth was not retired"
    )

    # a FOREIGN path-configuration file sharing the name is left alone
    pth.write_text("/some/other/path\n")
    assert stateful.remove_usersite_shim() is False
    assert pth.exists()
    pth.unlink()


def test_opt_out_env_disables_provisioning(tmp_path, monkeypatch):
    """SPJ_NO_USERSITE_SHIM=1 must prevent any .pth write (ADVICE r08:
    machine-global import-behavior changes need an escape hatch)."""
    import site

    from spj_query_engine_spark.streaming import stateful

    scratch_site = tmp_path / "userbase" / "site-packages"
    scratch_site.mkdir(parents=True)
    monkeypatch.setattr(site, "ENABLE_USER_SITE", True)
    monkeypatch.setattr(site, "USER_SITE", str(scratch_site))
    monkeypatch.setenv("PYTHONUSERBASE", str(tmp_path / "userbase"))
    monkeypatch.setenv("SPJ_NO_USERSITE_SHIM", "1")
    monkeypatch.setattr(stateful, "_USERSITE_PROVISIONED", None)
    stateful.provision_usersite_shim()
    assert not (scratch_site / stateful.USERSITE_PTH_NAME).exists()
