"""Vendored minimal protobuf runtime (spj_query_engine_spark/_vendor/
protoshim): wire-format checks against hand-computed encodings from the
public protobuf encoding spec, driven through the REAL generated module
(pyspark's StateMessage_pb2) so the descriptor-parsing path is exercised
end-to-end.  The authoritative integration check is
test_streaming_multimodal.py::test_tws_running_totals, where the JVM state
server is the wire peer.

No Spark session needed here.
"""

from __future__ import annotations

import sys

import pytest

SHIM = None


def _pb2():
    """Import pyspark's generated module through whatever protobuf runtime
    resolves — the shim when no real distribution exists."""
    from spj_query_engine_spark.streaming.stateful import (
        PROTOSHIM_DIR,
        ensure_protobuf,
    )

    if not ensure_protobuf(None):
        pytest.skip("no protobuf runtime available at all")
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_scalar_fields_exact_bytes():
    sm = _pb2()
    r = sm.StateResponse(statusCode=1, errorMessage="x", value=b"ab")
    assert r.SerializeToString() == b"\x08\x01\x12\x01x\x1a\x02ab"
    back = sm.StateResponse()
    back.ParseFromString(b"\x08\x01\x12\x01x\x1a\x02ab")
    assert (back.statusCode, back.errorMessage, back.value) == (1, "x", b"ab")


def test_empty_oneof_member_emits_zero_length():
    """The request unions rely on an EMPTY message member (e.g.
    RemoveImplicitKey) being emitted as a zero-length length-delimited
    field — dropping it would leave the JVM seeing no method set."""
    sm = _pb2()
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    assert req.SerializeToString() == b"\x22\x02\x12\x00"


def test_negative_int64_ten_byte_varint():
    sm = _pb2()
    t = sm.RegisterTimer(expiryTimestampMs=-1)
    assert t.SerializeToString() == b"\x08" + b"\xff" * 9 + b"\x01"
    back = sm.RegisterTimer()
    back.ParseFromString(t.SerializeToString())
    assert back.expiryTimestampMs == -1


def test_repeated_message_round_trip():
    sm = _pb2()
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=5),
            sm.TimerInfo(timestampMs=7),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [
        (b"k1", 5),
        (b"", 7),
    ]
    assert back.requireNextFetch is True


def test_enum_and_nested_oneof_round_trip():
    sm = _pb2()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.statefulProcessorCall.setHandleState.state == 3


def test_unknown_fields_skipped():
    sm = _pb2()
    # field 200 varint + a valid statusCode — unknown must be ignored
    payload = b"\xc0\x0c\x05" + b"\x08\x02"  # (200<<3)|0 = 1600 -> varint c0 0c
    back = sm.StateResponse()
    back.ParseFromString(payload)
    assert back.statusCode == 2


def test_repeated_bytes_values():
    sm = _pb2()
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb"], requireNextFetch=False
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert back.value == [b"a", b"bb"]
    # absent repeated field reads as empty list
    assert sm.StateResponseWithListGet().value == []


def test_real_protobuf_wins_when_present():
    """The shim path is appended only on ImportError — if a real
    google.protobuf is importable without the shim dir, the shim must not
    shadow it."""
    from spj_query_engine_spark.streaming.stateful import PROTOSHIM_DIR

    had_shim = PROTOSHIM_DIR in sys.path
    if not had_shim:
        # a real distribution resolved first; nothing more to assert
        import google.protobuf  # noqa: F401

        return
    # shim active: its version marker should match the gencode it targets
    import google.protobuf as gp

    assert gp.__version__ == "6.33.0"


# ---------------------------------------------------------------------------
# Usersite self-provisioning (the e32f driver-session channel)
# ---------------------------------------------------------------------------


def _reset_provision_cache():
    from spj_query_engine_spark.streaming import stateful

    stateful._USERSITE_PROVISIONED = None


def test_provision_noop_when_fresh_interpreter_already_resolves(
    monkeypatch, tmp_path
):
    """Real-protobuf-wins guard: when a fresh interpreter already imports
    google.protobuf (real distribution or prior .pth), provisioning must
    not write anything."""
    import site

    from spj_query_engine_spark.streaming import stateful

    _reset_provision_cache()
    monkeypatch.setattr(
        stateful, "_fresh_interpreter_imports_protobuf", lambda *a, **k: True
    )
    monkeypatch.setattr(site, "getusersitepackages", lambda: str(tmp_path))
    try:
        assert stateful.provision_usersite_shim() is True
        assert list(tmp_path.iterdir()) == []  # nothing written
    finally:
        _reset_provision_cache()


def test_provision_writes_pth_then_verifies(monkeypatch, tmp_path):
    """When a fresh interpreter cannot import protobuf, provisioning writes
    exactly one .pth naming the shim dir into usersite, then re-probes."""
    import os
    import site

    from spj_query_engine_spark.streaming import stateful

    _reset_provision_cache()
    calls = []

    def fake_probe(*a, **k):
        # r09 flow: (1) -s probe (real dist?) fails, (2) plain pre-write
        # probe fails, (3) post-write verify passes
        calls.append(k.get("no_user_site", False))
        return len(calls) > 2

    monkeypatch.setattr(
        stateful, "_fresh_interpreter_imports_protobuf", fake_probe
    )
    monkeypatch.setattr(site, "getusersitepackages", lambda: str(tmp_path))
    monkeypatch.setattr(site, "ENABLE_USER_SITE", True, raising=False)
    try:
        assert stateful.provision_usersite_shim() is True
        pth = tmp_path / stateful.USERSITE_PTH_NAME
        assert pth.read_text() == os.path.abspath(stateful.PROTOSHIM_DIR) + "\n"
        assert calls == [True, False, False]
        # cached: a second call re-probes nothing
        assert stateful.provision_usersite_shim() is True
        assert len(calls) == 3
    finally:
        _reset_provision_cache()


def test_provision_refuses_when_usersite_disabled(monkeypatch, tmp_path):
    import site

    from spj_query_engine_spark.streaming import stateful

    _reset_provision_cache()
    monkeypatch.setattr(
        stateful, "_fresh_interpreter_imports_protobuf", lambda *a, **k: False
    )
    monkeypatch.setattr(site, "getusersitepackages", lambda: str(tmp_path))
    monkeypatch.setattr(site, "ENABLE_USER_SITE", False, raising=False)
    try:
        assert stateful.provision_usersite_shim() is False
        assert list(tmp_path.iterdir()) == []
    finally:
        _reset_provision_cache()
