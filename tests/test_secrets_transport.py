"""S10 secrets-sourced connection config + live-shaped pyrfc transport
(reference parity: pyrfc_read_table.py:61-71 connection, :91-109 secret
fetch).  pyrfc/boto3 are absent in this container, so both are exercised
through their public shapes: an injected sys.modules fake and an injected
boto3-shaped secrets client."""

from __future__ import annotations

import json
import sys
import types

import pytest

from guidance_for_sap_data_integration_and_management_on_aws_spark.sources import secrets as secrets_mod
from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.rfc import (
    RFC_READ_FUNCTION,
    PyRfcTransport,
)
from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
    _transport_from_options,
)

AUTH = {"ashost": "sap.example", "sysnr": "00", "client": "100", "user": "u", "passwd": "p"}


class _FakeConnection:
    calls: list[tuple] = []

    def __init__(self, **kwargs):
        self.conn_kwargs = kwargs

    def call(self, func, **kwargs):
        _FakeConnection.calls.append((func, kwargs))
        return {"FIELDS": [], "OUT_TABLE": "DATA", "DATA": []}


@pytest.fixture
def fake_pyrfc(monkeypatch):
    mod = types.ModuleType("pyrfc")
    mod.Connection = _FakeConnection
    monkeypatch.setitem(sys.modules, "pyrfc", mod)
    _FakeConnection.calls = []
    return mod


class _FakeSecretsClient:
    def __init__(self, store):
        self.store = store

    def get_secret_value(self, SecretId):  # noqa: N803 (boto3 casing)
        return {"SecretString": json.dumps(self.store[SecretId])}


@pytest.fixture
def injected_secrets():
    secrets_mod.set_secret_client(_FakeSecretsClient({"sap/dev": AUTH}))
    yield
    secrets_mod.set_secret_client(None)


def test_resolve_secret_injected_client(injected_secrets):
    assert secrets_mod.resolve_secret("sap/dev") == AUTH


def test_resolve_secret_env_var(monkeypatch):
    monkeypatch.setenv("SAPRFC_SECRET_SAP_PROD", json.dumps(AUTH))
    assert secrets_mod.resolve_secret("sap/prod") == AUTH


def test_resolve_secret_json_file(monkeypatch, tmp_path):
    f = tmp_path / "secrets.json"
    f.write_text(json.dumps({"sap/qa": AUTH}))
    monkeypatch.setenv("SAPRFC_SECRETS_FILE", str(f))
    assert secrets_mod.resolve_secret("sap/qa") == AUTH


def test_resolve_secret_missing_raises():
    with pytest.raises(KeyError, match="sap/nope"):
        secrets_mod.resolve_secret("sap/nope")


def test_resolve_secret_incomplete_raises(monkeypatch):
    monkeypatch.setenv("SAPRFC_SECRET_BAD", json.dumps({"ashost": "x"}))
    with pytest.raises(ValueError, match="missing keys"):
        secrets_mod.resolve_secret("bad")


def test_secret_option_reaches_pyrfc_connection(fake_pyrfc, injected_secrets):
    t = _transport_from_options({"transport": "pyrfc", "secretid": "sap/dev"})
    assert isinstance(t, PyRfcTransport)
    assert t._conn.conn_kwargs == AUTH  # exact reference Connection(...) kwargs


def test_explicit_options_reach_pyrfc_connection(fake_pyrfc):
    t = _transport_from_options({"transport": "pyrfc", **AUTH})
    assert t._conn.conn_kwargs == AUTH


def test_pyrfc_missing_config_raises(fake_pyrfc):
    with pytest.raises(ValueError, match="secretId"):
        _transport_from_options({"transport": "pyrfc", "ashost": "only"})


def test_pyrfc_call_shape_matches_bapi(fake_pyrfc):
    t = PyRfcTransport(**AUTH)
    t.call("DD03L", "`", 200, 100, options=["TABNAME EQ 'T1'"], fields=["TABNAME", "LENG"])
    [(func, kwargs)] = _FakeConnection.calls
    assert func == RFC_READ_FUNCTION
    assert kwargs == {
        "QUERY_TABLE": "DD03L",
        "DELIMITER": "`",
        "ROWSKIPS": 200,
        "ROWCOUNT": 100,
        "OPTIONS": [{"TEXT": "TABNAME EQ 'T1'"}],
        "FIELDS": [{"FIELDNAME": "TABNAME"}, {"FIELDNAME": "LENG"}],
    }
    # paging params omitted when zero-page defaults? no — always explicit;
    # OPTIONS/FIELDS omitted when empty (BAPI defaults)
    _FakeConnection.calls = []
    t.call("DD03L", "`", 0, 100)
    [(_, kwargs2)] = _FakeConnection.calls
    assert "OPTIONS" not in kwargs2 and "FIELDS" not in kwargs2


def test_pyrfc_row_count_unimplemented(fake_pyrfc):
    with pytest.raises(NotImplementedError, match="totalrows"):
        PyRfcTransport(**AUTH).row_count("DD03L")
