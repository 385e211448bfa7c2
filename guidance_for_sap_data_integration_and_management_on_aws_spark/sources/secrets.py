"""Secrets-sourced connection config (SURVEY §2.1 S10).

The reference fetches SAP credentials from AWS Secrets Manager at job start
(`/root/reference/pyrfc_read_table/pyrfc_read_table.py:91-109`: a boto3
``get_secret_value(SecretId=...)`` whose SecretString is a JSON object with
keys ``ashost / sysnr / client / user / passwd``, per the reference
README.md:164-168).  This module is the Spark-side equivalent: a provider
chain that resolves ``.option("secretId", ...)`` into that credential dict.

Resolution order (first hit wins):

1. an injected boto3-shaped client (tests / custom vaults) registered via
   ``set_secret_client`` — anything with ``get_secret_value(SecretId=...)``
   returning ``{"SecretString": "<json>"}``;
2. the environment variable ``SAPRFC_SECRET_<ID>`` (non-alphanumerics in the
   id mapped to ``_``) holding the JSON string — the air-gapped/dev path;
3. a JSON file of ``{secret_id: {...}, ...}`` at ``$SAPRFC_SECRETS_FILE``;
4. boto3 Secrets Manager, if boto3 is importable (it is not in this
   container — the import is guarded and exercised via injection in tests).

Every provider returns the same shape, so the transport layer never knows
where credentials came from.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Protocol

REQUIRED_KEYS = ("ashost", "sysnr", "client", "user", "passwd")


class SecretClient(Protocol):
    def get_secret_value(self, SecretId: str) -> dict: ...  # noqa: N803 (boto3 casing)


_injected_client: SecretClient | None = None


def set_secret_client(client: SecretClient | None) -> None:
    """Inject a boto3-shaped secrets client (None to clear)."""
    global _injected_client
    _injected_client = client


def _env_key(secret_id: str) -> str:
    """Env-var name for a secret id.  NB: every non-alphanumeric maps to '_'
    (env-var charset), so ids differing only in punctuation ('sap/dev' vs
    'sap-dev') share one variable — use the JSON-file or client providers
    when two such ids must coexist."""
    return "SAPRFC_SECRET_" + re.sub(r"[^A-Za-z0-9]", "_", secret_id).upper()


def resolve_secret(secret_id: str, region_name: str | None = None) -> dict[str, Any]:
    """Resolve a secret id to the SAP credential dict; raises KeyError with
    the providers tried if nothing matches, ValueError if keys are missing."""
    raw: str | None = None
    if _injected_client is not None:
        raw = _injected_client.get_secret_value(SecretId=secret_id)["SecretString"]
    if raw is None:
        raw = os.environ.get(_env_key(secret_id))
    if raw is None:
        path = os.environ.get("SAPRFC_SECRETS_FILE")
        if path and os.path.exists(path):
            with open(path) as fh:
                entry = json.load(fh).get(secret_id)
            if entry is not None:
                raw = json.dumps(entry)
    aws_err: Exception | None = None
    if raw is None:
        try:  # boto3 absent in some containers; guarded exactly like pyrfc
            import boto3  # type: ignore[import-not-found]
        except ImportError:
            boto3 = None
        if boto3 is not None:
            try:
                client = boto3.session.Session().client(
                    service_name="secretsmanager", region_name=region_name
                )
                raw = client.get_secret_value(SecretId=secret_id)["SecretString"]
            except Exception as e:
                # fall through to the not-found error, but carry the real AWS
                # failure (AccessDenied, NoRegion, throttling) — masking it as
                # plain not-found would misdirect debugging
                aws_err = e
    if raw is None:
        msg = (
            f"secret {secret_id!r} not found (tried injected client, "
            f"${_env_key(secret_id)}, $SAPRFC_SECRETS_FILE, boto3"
            + (f"; boto3 failed: {type(aws_err).__name__}: {aws_err}" if aws_err else "")
            + ")"
        )
        raise KeyError(msg) from aws_err
    auth = json.loads(raw)
    missing = [k for k in REQUIRED_KEYS if k not in auth]
    if missing:
        raise ValueError(f"secret {secret_id!r} missing keys {missing}")
    return auth
