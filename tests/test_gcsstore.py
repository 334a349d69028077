"""GCSStore (sources/gcsstore.py) against the same fake XML-API
endpoint as the S3 tests — GCS's XML API speaks the S3 dialect, so
the store reuses S3Store's verbs and swaps auth for an OAuth bearer
token."""

from __future__ import annotations

import pickle

import pytest

from hls_stac_parquet_spark.sources.gcsstore import GCSStore
from tests.test_s3store import fake_s3  # noqa: F401 — shared fixture


def _token():
    return "ya29.test-token"


def test_gcs_roundtrip_bearer_auth(fake_s3):  # noqa: F811
    endpoint, objects, auth_seen, _ = fake_s3
    store = GCSStore(
        "gs://gbucket/pre", token_provider=_token, endpoint=endpoint
    )
    assert not store.exists("a/b.json")
    store.put_bytes("a/b.json", b"[1]")
    assert objects["pre/a/b.json"] == b"[1]"
    assert store.exists("a/b.json")
    assert store.get_bytes("a/b.json") == b"[1]"
    store.delete("a/b.json")
    assert not store.exists("a/b.json")
    # every request carried the bearer token, never SigV4
    assert auth_seen and all(
        a == "Bearer ya29.test-token" for a in auth_seen
    )
    assert store.full_url("a/b.json") == "gs://gbucket/pre/a/b.json"
    assert store.spark_url("a/b.json") == "gs://gbucket/pre/a/b.json"


def test_gcs_list_paginates(fake_s3):  # noqa: F811
    endpoint, _, _, _ = fake_s3
    store = GCSStore("gs://g", token_provider=_token, endpoint=endpoint)
    keys = [f"links/2025/10/2025-10-{d:02d}.json" for d in range(1, 6)]
    for k in keys:
        store.put_bytes(k, b"[]")
    assert store.list("links/2025/10") == keys  # page size 2 → 3 pages


def test_gcs_multipart_upload(fake_s3):  # noqa: F811
    endpoint, objects, _, st = fake_s3
    store = GCSStore(
        "gs://g", token_provider=_token, endpoint=endpoint,
        multipart_threshold=50, part_size=32,
    )
    data = bytes(range(100))
    store.put_bytes("big.bin", data)
    assert objects["big.bin"] == data
    kinds = [e[0] for e in st.mpu_events]
    assert kinds.count("create") == 1 and kinds.count("part") == 4


def test_gcs_403_semantics(monkeypatch):
    anon = GCSStore("gs://g", token_provider=None, endpoint="http://x")
    monkeypatch.setattr(anon, "_request", lambda *a, **k: (403, b"", {}))
    assert anon.exists("k") is False
    authed = GCSStore("gs://g", token_provider=_token, endpoint="http://x")
    monkeypatch.setattr(authed, "_request", lambda *a, **k: (403, b"", {}))
    with pytest.raises(IOError, match="403"):
        authed.exists("k")


def test_gcs_store_is_picklable():
    store = GCSStore("gs://g/p", token_provider=_token)
    clone = pickle.loads(pickle.dumps(store))
    assert clone.bucket == "g" and clone.prefix == "p"
    assert clone.token_provider() == "ya29.test-token"


def test_gcs_scheme_registration(fake_s3):  # noqa: F811
    endpoint, objects, _, _ = fake_s3
    from hls_stac_parquet_spark.sources.gcsstore import register_gcs_scheme
    from hls_stac_parquet_spark.store import _SCHEME_FACTORIES, get_store

    register_gcs_scheme(token_provider=_token, endpoint=endpoint)
    try:
        store = get_store("gs://some-bucket/dest")
        store.put_bytes("k.json", b"{}")
        assert objects["dest/k.json"] == b"{}"
    finally:
        _SCHEME_FACTORIES.pop("gs", None)
