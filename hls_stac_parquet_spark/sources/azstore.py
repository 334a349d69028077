"""Azure Blob Storage store (``az://``) over the Blob REST API.

Completes the cloud-store matrix next to ``s3://`` (sources/
s3store.py) and ``gs://`` (sources/gcsstore.py) and closes the
round-6 scope note (README: az:// was previously "bring your own
store via register_store_scheme"). The reference reaches object
storage through obstore's multi-cloud Rust client (links.py:92-96);
here the same verbs the sinks need are issued with stdlib ``urllib``:

- HEAD blob                      → :meth:`exists`
- Put Blob (BlockBlob)           → :meth:`put_bytes` (small objects)
- Put Block / Put Block List     → :meth:`put_bytes` beyond the
  multipart threshold (Azure caps one-shot Put Blob; the block-list
  two-phase is its multipart analog — uncommitted blocks expire
  server-side after 7 days, so a failed upload cannot half-commit)
- Get Blob                       → :meth:`get_bytes`
- Delete Blob                    → :meth:`delete`
- List Blobs (restype=container&comp=list, marker paging)
                                 → :meth:`list`

Auth, in priority order:

- ``account`` + ``account_key`` → SharedKey request signing
  (HMAC-SHA256 over the 2009-09-19+ canonical string, stdlib only;
  every retry RE-SIGNS so ``x-ms-date`` stays current),
- ``sas_token`` → appended to every request's query string (no
  signing; the token IS the grant),
- neither → anonymous (public containers / test fakes).

Spark-side DataFrame reads of the same objects go through Hadoop's
ABFS connector when the cluster has it (``spark_url`` maps
``az://container/path`` → ``abfss://container@account.dfs.core.
windows.net/path``); this class serves the custom executor-side
manifest/footer-stamping writers that bypass Hadoop, exactly like its
S3/GCS siblings.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import time
import urllib.request
import xml.etree.ElementTree as ET
from email.utils import formatdate
from typing import BinaryIO, Callable
from urllib.parse import parse_qsl, quote, urlparse

from hls_stac_parquet_spark.sources.retry import request_with_retries
from hls_stac_parquet_spark.store import Store, register_store_scheme

#: Blob service API version sent (and signed) with every request.
API_VERSION = "2021-08-06"


def shared_key_signature(
    method: str,
    url: str,
    headers: dict[str, str],
    account: str,
    account_key: str,
) -> str:
    """SharedKey signature for one request (2009-09-19+ canonical
    string). ``headers`` must already contain every x-ms-* header the
    request will send; standard headers are read from it too. Pure
    stdlib; returns the base64 signature (caller builds the
    ``SharedKey account:sig`` Authorization value)."""
    parsed = urlparse(url)
    lower = {k.lower(): v for k, v in headers.items()}

    def h(name: str) -> str:
        return lower.get(name, "")

    # Content-Length signs as "" when 0/absent (2015-02-21 rule)
    length = h("content-length")
    if length == "0":
        length = ""
    canon_headers = "".join(
        f"{k}:{lower[k]}\n"
        for k in sorted(lower)
        if k.startswith("x-ms-")
    )
    canon_resource = f"/{account}{parsed.path}"
    for k, v in sorted(parse_qsl(parsed.query, keep_blank_values=True)):
        canon_resource += f"\n{k.lower()}:{v}"
    string_to_sign = "\n".join(
        [
            method,
            h("content-encoding"),
            h("content-language"),
            length,
            h("content-md5"),
            h("content-type"),
            h("date") if not h("x-ms-date") else "",
            h("if-modified-since"),
            h("if-match"),
            h("if-none-match"),
            h("if-unmodified-since"),
            h("range"),
        ]
    ) + "\n" + canon_headers + canon_resource
    digest = hmac.new(
        base64.b64decode(account_key),
        string_to_sign.encode("utf-8"),
        hashlib.sha256,
    ).digest()
    return base64.b64encode(digest).decode()


class AzureBlobStore(Store):
    """Store bound to ``az://container[/prefix]``.

    ``account``: storage-account name (required for SharedKey signing
    and for the default endpoint / abfss ``spark_url``).
    ``account_key``: base64 account key → SharedKey auth.
    ``sas_token``: pre-signed SAS query string (with or without the
    leading ``?``) → appended to every request instead of signing.
    ``endpoint``: override for Azurite/test fakes (default
    ``https://{account}.blob.core.windows.net/{container}``).
    Picklable (strings only), so executor tasks re-bind cheaply like
    the other stores. ``now`` is an injection seam so signing tests
    can pin ``x-ms-date``.
    """

    distributed = True

    #: one-shot Put Blob cap is service-version dependent (5000 MiB at
    #: this API version); far below that, the block-list path bounds
    #: per-request memory and retries at part granularity.
    DEFAULT_MULTIPART_THRESHOLD = 64 * 1024 * 1024
    DEFAULT_PART_SIZE = 64 * 1024 * 1024

    def __init__(
        self,
        url: str,
        account: str | None = None,
        account_key: str | None = None,
        sas_token: str | None = None,
        endpoint: str | None = None,
        timeout: float = 60.0,
        spark_readable: bool = True,
        multipart_threshold: int | None = None,
        part_size: int | None = None,
        retry_attempts: int = 3,
        now: Callable[[], float] = time.time,
    ):
        parsed = urlparse(url)
        self.container = parsed.netloc
        self.prefix = parsed.path.strip("/")
        self.account = account
        self.account_key = account_key
        self.sas_token = (sas_token or "").lstrip("?") or None
        if endpoint:
            self.endpoint = endpoint.rstrip("/")
        else:
            if not account:
                raise ValueError(
                    "AzureBlobStore needs `account` (for the default "
                    "endpoint) or an explicit `endpoint`"
                )
            self.endpoint = (
                f"https://{account}.blob.core.windows.net/{self.container}"
            )
        self.timeout = timeout
        self.spark_readable = spark_readable
        self.multipart_threshold = (
            multipart_threshold
            if multipart_threshold is not None
            else self.DEFAULT_MULTIPART_THRESHOLD
        )
        self.part_size = (
            part_size if part_size is not None else self.DEFAULT_PART_SIZE
        )
        self.retry_attempts = retry_attempts
        self.now = now

    # -- store identity ----------------------------------------------------

    def _key(self, path: str) -> str:
        return f"{self.prefix}/{path}" if self.prefix else path

    def full_url(self, path: str) -> str:
        return f"az://{self.container}/" + self._key(path)

    def spark_url(self, path: str = "") -> str | None:
        if not self.spark_readable or not self.account:
            return None
        suffix = self._key(path) if path else self.prefix
        return (
            f"abfss://{self.container}@{self.account}"
            f".dfs.core.windows.net/{suffix}"
        ).rstrip("/")

    def _is_authed(self) -> bool:
        return self.account_key is not None or self.sas_token is not None

    # -- request plumbing ---------------------------------------------------

    def _request(
        self,
        method: str,
        key: str,
        data: bytes = b"",
        query: str = "",
        extra_headers: dict[str, str] | None = None,
    ) -> tuple[int, bytes, dict[str, str]]:
        """One request with transient-failure retries (429/5xx/network
        → jittered backoff, Retry-After honored — sources/retry.py).
        Each retry RE-SIGNS so x-ms-date stays current."""
        path = "/" + quote(key, safe="/-_.~") if key else ""
        q = query
        if self.sas_token:
            q = f"{q}&{self.sas_token}" if q else self.sas_token
        url = self.endpoint + path + (f"?{q}" if q else "")

        def send() -> tuple[int, bytes, dict[str, str]]:
            headers = {
                "x-ms-version": API_VERSION,
                "x-ms-date": formatdate(self.now(), usegmt=True),
            }
            if extra_headers:
                headers.update(extra_headers)
            if method in ("PUT", "POST"):
                headers["Content-Length"] = str(len(data))
            if self.account_key and self.account:
                sig = shared_key_signature(
                    method, url, headers, self.account, self.account_key
                )
                headers["Authorization"] = (
                    f"SharedKey {self.account}:{sig}"
                )
            req = urllib.request.Request(
                url,
                data=data if method in ("PUT", "POST") else None,
                headers=headers,
                method=method,
            )
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read(), dict(resp.headers)

        return request_with_retries(send, attempts=self.retry_attempts)

    # -- the four verbs -----------------------------------------------------

    def exists(self, path: str) -> bool:
        status, _, _ = self._request("HEAD", self._key(path))
        if status == 200:
            return True
        if status == 404:
            return False
        if status in (401, 403):
            # anonymous probe of a private container reads as absent;
            # WITH auth supplied this is expired/denied auth and must
            # fail loudly (same contract as S3Store.exists)
            if not self._is_authed():
                return False
            raise IOError(
                f"HEAD {path}: HTTP {status} with auth supplied "
                "(expired/denied, not a missing blob)"
            )
        raise IOError(f"HEAD {path}: HTTP {status}")

    def put_bytes(self, path: str, data: bytes) -> None:
        if len(data) > self.multipart_threshold:
            self._put_block_list(path, data)
            return
        status, body, _ = self._request(
            "PUT",
            self._key(path),
            data=data,
            extra_headers={"x-ms-blob-type": "BlockBlob"},
        )
        if status not in (200, 201):
            raise IOError(f"PUT {path}: HTTP {status} {body[:200]!r}")

    def _put_block_list(self, path: str, data: bytes) -> None:
        """Put Block / Put Block List — Azure's multipart. Uncommitted
        blocks are GC'd by the service (7-day TTL), so a failed upload
        leaves no visible partial object; a caller retry re-stages
        blocks under the same ids and converges."""
        key = self._key(path)
        block_ids: list[str] = []
        for n, off in enumerate(range(0, len(data), self.part_size)):
            bid = base64.b64encode(f"block-{n:08d}".encode()).decode()
            part = data[off : off + self.part_size]
            status, body, _ = self._request(
                "PUT",
                key,
                data=part,
                query="comp=block&blockid=" + quote(bid, safe=""),
            )
            if status not in (200, 201):
                raise IOError(
                    f"PutBlock {path} #{n}: HTTP {status} {body[:200]!r}"
                )
            block_ids.append(bid)
        manifest = (
            "<?xml version=\"1.0\" encoding=\"utf-8\"?><BlockList>"
            + "".join(f"<Latest>{b}</Latest>" for b in block_ids)
            + "</BlockList>"
        ).encode()
        status, body, _ = self._request(
            "PUT", key, data=manifest, query="comp=blocklist"
        )
        if status not in (200, 201):
            raise IOError(
                f"PutBlockList {path}: HTTP {status} {body[:200]!r}"
            )

    def get_bytes(self, path: str) -> bytes:
        status, body, _ = self._request("GET", self._key(path))
        if status != 200:
            raise IOError(f"GET {path}: HTTP {status}")
        return body

    def delete(self, path: str) -> None:
        status, body, _ = self._request("DELETE", self._key(path))
        if status not in (200, 202, 204):
            raise IOError(f"DELETE {path}: HTTP {status} {body[:200]!r}")

    def list(self, prefix: str) -> list[str]:
        """List Blobs with marker paging (restype=container&comp=list)."""
        key_prefix = self._key(prefix).rstrip("/") + "/"
        strip = len(self.prefix) + 1 if self.prefix else 0
        keys: list[str] = []
        marker: str | None = None
        while True:
            query = (
                "restype=container&comp=list&prefix="
                + quote(key_prefix, safe="")
            )
            if marker:
                query += "&marker=" + quote(marker, safe="")
            status, body, _ = self._request("GET", "", query=query)
            if status != 200:
                raise IOError(f"LIST {prefix}: HTTP {status}")
            root = ET.fromstring(body)
            for name in root.findall("./Blobs/Blob/Name"):
                keys.append(name.text[strip:])
            marker = root.findtext("NextMarker") or None
            if not marker:
                return sorted(keys)

    def open_output(self, path: str) -> BinaryIO:
        import io

        store, key = self, path

        class _Buf(io.BytesIO):
            def close(buf) -> None:  # noqa: N805 — commit on close
                store.put_bytes(key, buf.getvalue())
                io.BytesIO.close(buf)

        return _Buf()


def register_az_scheme(
    account: str | None = None,
    account_key: str | None = None,
    sas_token: str | None = None,
    endpoint: str | None = None,
) -> None:
    """One-line deployment hook: make ``get_store("az://…")`` work."""
    register_store_scheme(
        "az",
        lambda url: AzureBlobStore(
            url,
            account=account,
            account_key=account_key,
            sas_token=sas_token,
            endpoint=endpoint,
        ),
    )
