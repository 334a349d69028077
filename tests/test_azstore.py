"""AzureBlobStore (sources/azstore.py) against a local fake Azure
Blob endpoint — HEAD / Put Blob / Put Block(+List) / Get / Delete /
List Blobs with marker paging, SharedKey signing, and SAS passthrough."""

from __future__ import annotations

import base64
import hashlib
import hmac
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import pytest

from hls_stac_parquet_spark.sources.azstore import (
    API_VERSION,
    AzureBlobStore,
    register_az_scheme,
    shared_key_signature,
)

PAGE = 2  # tiny List Blobs page to exercise marker paging

# a syntactically valid base64 account key (Azurite's well-known dev key)
DEV_KEY = (
    "Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4I6tq/K1SZFPTOtr/KBHBeksoGMGw=="
)


@pytest.fixture()
def fake_az():
    """Dict-backed Azure-Blob-compatible endpoint: Put/Get/Head/Delete
    + paged List Blobs + Put Block / Put Block List; records
    Authorization headers, raw query strings, and block events."""
    objects: dict[str, bytes] = {}
    auth_seen: list[str | None] = []
    queries_seen: list[str] = []
    staged: dict[str, dict[str, bytes]] = {}  # key -> {block_id: bytes}
    block_events: list[tuple] = []

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _key(self):
            # endpoint root is the container: /container/<key>
            return unquote(
                urlparse(self.path).path.lstrip("/").split("/", 1)[-1]
            ) if "/" in urlparse(self.path).path.lstrip("/") else ""

        def _record(self):
            auth_seen.append(self.headers.get("Authorization"))
            queries_seen.append(urlparse(self.path).query)

        def _respond(self, code, body=b""):
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def do_PUT(self):
            self._record()
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            qs = parse_qs(urlparse(self.path).query)
            key = self._key()
            comp = qs.get("comp", [None])[0]
            if comp == "block":
                bid = qs["blockid"][0]
                staged.setdefault(key, {})[bid] = data
                block_events.append(("block", key, bid, len(data)))
                self._respond(201)
            elif comp == "blocklist":
                import xml.etree.ElementTree as ET

                ids = [e.text for e in ET.fromstring(data)]
                blocks = staged.pop(key, {})
                missing = [b for b in ids if b not in blocks]
                if missing:
                    self._respond(400, b"<Error>InvalidBlockList</Error>")
                    return
                objects[key] = b"".join(blocks[b] for b in ids)
                block_events.append(("commit", key, ids))
                self._respond(201)
            else:
                if self.headers.get("x-ms-blob-type") != "BlockBlob":
                    self._respond(400, b"<Error>MissingBlobType</Error>")
                    return
                objects[key] = data
                self._respond(201)

        def do_HEAD(self):
            self._record()
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
            self._record()
            parsed = urlparse(self.path)
            qs = parse_qs(parsed.query)
            if qs.get("comp") == ["list"]:
                prefix = qs.get("prefix", [""])[0]
                marker = qs.get("marker", [""])[0]
                keys = sorted(k for k in objects if k.startswith(prefix))
                if marker:
                    keys = [k for k in keys if k > marker]
                page, rest = keys[:PAGE], keys[PAGE:]
                parts = ["<EnumerationResults><Blobs>"]
                for k in page:
                    parts.append(f"<Blob><Name>{k}</Name></Blob>")
                parts.append("</Blobs>")
                if rest:
                    parts.append(f"<NextMarker>{page[-1]}</NextMarker>")
                parts.append("</EnumerationResults>")
                self._respond(200, "".join(parts).encode())
            elif self._key() in objects:
                self._respond(200, objects[self._key()])
            else:
                self._respond(404, b"<Error>BlobNotFound</Error>")

        def do_DELETE(self):
            self._record()
            if self._key() in objects:
                del objects[self._key()]
                self._respond(202)
            else:
                self._respond(404)

        def log_message(self, *a):  # quiet
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    endpoint = f"http://127.0.0.1:{server.server_port}/testcont"
    try:
        yield endpoint, objects, auth_seen, queries_seen, block_events
    finally:
        server.shutdown()


def test_az_roundtrip_anonymous(fake_az):
    endpoint, objects, auth_seen, _, _ = fake_az
    store = AzureBlobStore(
        "az://testcont/some/prefix", endpoint=endpoint
    )
    assert not store.exists("a/b.json")
    store.put_bytes("a/b.json", b"[1]")
    assert objects["some/prefix/a/b.json"] == b"[1]"
    assert store.exists("a/b.json")
    assert store.get_bytes("a/b.json") == b"[1]"
    with store.open_output("a/c.bin") as f:
        f.write(b"xyz")
    assert store.get_bytes("a/c.bin") == b"xyz"
    store.delete("a/b.json")
    assert not store.exists("a/b.json")
    assert all(a is None for a in auth_seen)
    assert store.full_url("a/b.json") == "az://testcont/some/prefix/a/b.json"


def test_az_spark_url_maps_to_abfss(fake_az):
    endpoint, *_ = fake_az
    store = AzureBlobStore(
        "az://testcont/px", account="acct", endpoint=endpoint
    )
    assert store.spark_url("d/x.parquet") == (
        "abfss://testcont@acct.dfs.core.windows.net/px/d/x.parquet"
    )
    # no account -> no Hadoop URL (readers fall back to the store)
    assert AzureBlobStore(
        "az://testcont", endpoint=endpoint
    ).spark_url("k") is None


def test_az_list_paginates(fake_az):
    endpoint, *_ = fake_az
    store = AzureBlobStore("az://testcont/px", endpoint=endpoint)
    keys = [f"links/2025/10/2025-10-{d:02d}.json" for d in range(1, 8)]
    for k in keys:
        store.put_bytes(k, b"[]")
    # 7 keys at page size 2 -> 4 List Blobs round-trips (marker paging)
    assert store.list("links/2025/10") == keys
    assert store.list("links/2025") == keys
    assert store.list("nothing/here") == []


def test_az_block_list_upload_above_threshold(fake_az):
    endpoint, objects, _, _, block_events = fake_az
    store = AzureBlobStore(
        "az://testcont",
        endpoint=endpoint,
        multipart_threshold=8,
        part_size=4,
    )
    data = b"0123456789abcde"  # 15 bytes -> 4 blocks of <=4
    store.put_bytes("big.bin", data)
    assert objects["big.bin"] == data
    kinds = [e[0] for e in block_events]
    assert kinds == ["block"] * 4 + ["commit"]
    # committed in staged order
    assert block_events[-1][2] == [e[2] for e in block_events[:4]]


def test_az_sas_token_appended(fake_az):
    endpoint, _, auth_seen, queries_seen, _ = fake_az
    store = AzureBlobStore(
        "az://testcont",
        endpoint=endpoint,
        sas_token="?sv=2021-08-06&sig=FAKESIG",
    )
    store.put_bytes("k.json", b"{}")
    assert store.get_bytes("k.json") == b"{}"
    assert all(a is None for a in auth_seen)  # SAS = no Authorization
    assert all("sv=2021-08-06" in q and "sig=FAKESIG" in q
               for q in queries_seen)


def test_az_sharedkey_signs_every_request(fake_az):
    endpoint, _, auth_seen, _, _ = fake_az
    store = AzureBlobStore(
        "az://testcont/px",
        account="acct",
        account_key=DEV_KEY,
        endpoint=endpoint,
    )
    store.put_bytes("a.json", b"[]")
    assert store.exists("a.json")
    assert store.list("") == ["a.json"]
    assert auth_seen and all(
        a and a.startswith("SharedKey acct:") for a in auth_seen
    )


def test_az_sharedkey_known_answer():
    """Signature matches an INDEPENDENT construction of the
    2009-09-19 canonical string for one pinned request (x-ms-date
    frozen) — guards the canonicalization rules (x-ms-* header sort,
    query-param lines, empty Date when x-ms-date present,
    Content-Length '' when 0)."""
    url = (
        "https://acct.blob.core.windows.net/cont/px/a.json"
        "?comp=list&restype=container"
    )
    headers = {
        "x-ms-version": API_VERSION,
        "x-ms-date": "Fri, 26 Aug 2026 00:00:00 GMT",
        "Content-Length": "0",
    }
    got = shared_key_signature("GET", url, headers, "acct", DEV_KEY)
    string_to_sign = (
        "GET\n"        # VERB
        "\n"           # Content-Encoding
        "\n"           # Content-Language
        "\n"           # Content-Length (0 signs as empty)
        "\n"           # Content-MD5
        "\n"           # Content-Type
        "\n"           # Date (empty: x-ms-date present)
        "\n"           # If-Modified-Since
        "\n"           # If-Match
        "\n"           # If-None-Match
        "\n"           # If-Unmodified-Since
        "\n"           # Range
        "x-ms-date:Fri, 26 Aug 2026 00:00:00 GMT\n"
        f"x-ms-version:{API_VERSION}\n"
        "/acct/cont/px/a.json\n"
        "comp:list\n"
        "restype:container"
    )
    want = base64.b64encode(
        hmac.new(
            base64.b64decode(DEV_KEY),
            string_to_sign.encode(),
            hashlib.sha256,
        ).digest()
    ).decode()
    assert got == want


def test_az_exists_403_semantics(monkeypatch):
    store = AzureBlobStore(
        "az://c", account="acct", account_key=DEV_KEY,
        endpoint="http://unused",
    )
    monkeypatch.setattr(
        store, "_request", lambda *a, **k: (403, b"", {})
    )
    with pytest.raises(IOError):
        store.exists("k")  # auth supplied: 403 must raise
    anon = AzureBlobStore("az://c", endpoint="http://unused")
    monkeypatch.setattr(
        anon, "_request", lambda *a, **k: (403, b"", {})
    )
    assert anon.exists("k") is False  # anonymous probe: absent


def test_az_store_is_picklable():
    import pickle

    store = AzureBlobStore(
        "az://c/p", account="a", account_key=DEV_KEY,
        endpoint="http://e",
    )
    clone = pickle.loads(pickle.dumps(store))
    assert clone.container == "c" and clone.prefix == "p"
    assert clone.account_key == DEV_KEY


def test_az_scheme_registration(fake_az):
    endpoint, objects, *_ = fake_az
    from hls_stac_parquet_spark.store import _SCHEME_FACTORIES, get_store

    register_az_scheme(endpoint=endpoint)
    try:
        store = get_store("az://testcont/reg")
        store.put_bytes("x.json", b"1")
        assert objects["reg/x.json"] == b"1"
        assert get_store("az://testcont/reg").get_bytes("x.json") == b"1"
    finally:
        _SCHEME_FACTORIES.pop("az", None)
