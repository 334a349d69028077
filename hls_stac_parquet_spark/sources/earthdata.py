"""NASA Earthdata credential provider + stdlib AWS SigV4 signer.

The reference obtains temporary S3 credentials per netloc from the
Earthdata ``s3credentials`` endpoint through obstore's
``NasaEarthdataAsyncCredentialProvider`` (fetch.py:39-44) and hands
them to its per-netloc stores. This repo's fetch stage
(sources/stac_fetch.py) exposes the same seam as a
``credential_provider(netloc) -> headers`` callable; until now only a
fake signer exercised it (tests/test_fetch.py). This module is the
concrete provider, pure stdlib:

- :func:`fetch_s3_credentials` — GET the public Earthdata
  ``s3credentials`` endpoint (Bearer token auth) and parse the
  temporary AWS credentials JSON.
- :class:`EarthdataCredentialProvider` — the callable for the fetch
  seam. HTTPS Earthdata hosts get ``Authorization: Bearer`` headers;
  temporary S3 credentials are cached until shortly before expiry and
  refreshed under a lock (one fetch per process per window, matching
  the reference's per-netloc store reuse).
- :func:`sigv4_headers` — AWS Signature V4 request signing (stdlib
  hmac/hashlib, the published AWS spec), the building block for
  registering a real ``s3://`` store factory with
  ``hls_stac_parquet_spark.store.register_store_scheme`` in a
  deployment. Verified in tests against the official AWS doc vector
  and cross-validated against botocore when available.

All endpoints here are public NASA services; no request is made
unless the caller configures a token/URL (offline-safe by default).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import hmac
import json
import threading
import urllib.request
from urllib.parse import quote, urlparse

#: the public LP DAAC endpoint the reference points obstore at
#: (fetch.py:41); other DAACs expose the same API at their own host
EARTHDATA_S3_CREDENTIALS_URL = (
    "https://data.lpdaac.earthdatacloud.nasa.gov/s3credentials"
)

#: refresh this many seconds before the advertised expiry
DEFAULT_TTL_MARGIN_S = 300


def fetch_s3_credentials(
    credentials_url: str = EARTHDATA_S3_CREDENTIALS_URL,
    token: str | None = None,
    timeout: float = 30.0,
) -> dict:
    """GET temporary S3 credentials from an Earthdata endpoint.

    Returns the parsed JSON: ``accessKeyId``, ``secretAccessKey``,
    ``sessionToken``, ``expiration``. Auth is an Earthdata Login
    Bearer token; without one the endpoint redirects to the EDL
    login flow and this raises (configure a token, or front the call
    with a netrc-aware opener in the deployment).
    """
    req = urllib.request.Request(credentials_url)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode())


def _parse_expiration(raw: str | None) -> dt.datetime | None:
    if not raw:
        return None
    try:
        return dt.datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        return None


class EarthdataCredentialProvider:
    """``credential_provider`` for sources/stac_fetch.py.

    - HTTPS hosts: returns ``Authorization: Bearer <token>`` for
      hosts matching ``bearer_suffixes`` (default: any ``*.nasa.gov``
      host), None otherwise — anonymous hosts stay anonymous.
    - :meth:`s3_credentials`: the cached temporary AWS credentials
      for direct-S3 access (feed to :func:`sigv4_headers` or an
      s3 store factory), refreshed ``ttl_margin_s`` before expiry.

    Picklable: tasks serialize the config, not the lock/cache, so
    each executor process fetches its own short-lived credentials
    lazily (the reference re-creates its provider per job the same
    way).
    """

    def __init__(
        self,
        token: str | None = None,
        credentials_url: str = EARTHDATA_S3_CREDENTIALS_URL,
        bearer_suffixes: tuple[str, ...] = (".nasa.gov",),
        ttl_margin_s: int = DEFAULT_TTL_MARGIN_S,
        fetcher=fetch_s3_credentials,
    ):
        self.token = token
        self.credentials_url = credentials_url
        self.bearer_suffixes = tuple(bearer_suffixes)
        self.ttl_margin_s = ttl_margin_s
        self._fetcher = fetcher
        self._lock = threading.Lock()
        self._creds: dict | None = None
        self._expires: dt.datetime | None = None

    # --- pickling: config travels, cache/lock do not ---
    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        state["_lock"] = None
        state["_creds"] = None
        state["_expires"] = None
        return state

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)
        self._lock = threading.Lock()

    def __call__(self, netloc: str) -> dict | None:
        host = netloc.rsplit("@", 1)[-1].split(":", 1)[0].lower()
        if self.token and any(
            host == s.lstrip(".") or host.endswith(s)
            for s in self.bearer_suffixes
        ):
            return {"Authorization": f"Bearer {self.token}"}
        return None

    def s3_credentials(self, now: dt.datetime | None = None) -> dict:
        """Temporary AWS credentials, fetched/refreshed as needed."""
        now = now or dt.datetime.now(dt.timezone.utc)
        with self._lock:
            if self._creds is not None and (
                self._expires is None
                or now
                < self._expires - dt.timedelta(seconds=self.ttl_margin_s)
            ):
                return self._creds
            creds = self._fetcher(self.credentials_url, self.token)
            self._creds = creds
            self._expires = _parse_expiration(creds.get("expiration"))
            return creds


# --- AWS Signature Version 4 (stdlib, published AWS spec) -------------------


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sigv4_headers(
    method: str,
    url: str,
    *,
    access_key: str,
    secret_key: str,
    session_token: str | None = None,
    region: str = "us-west-2",
    service: str = "s3",
    headers: dict[str, str] | None = None,
    payload: bytes = b"",
    amz_date: str | None = None,
) -> dict[str, str]:
    """Sign a request per AWS SigV4; returns the headers to send
    (input headers + host/x-amz-date/x-amz-content-sha256/
    x-amz-security-token/Authorization).

    ``amz_date`` (``YYYYMMDDTHHMMSSZ``) is a test seam; defaults to
    now(UTC).
    """
    parsed = urlparse(url)
    host = parsed.netloc
    if amz_date is None:
        amz_date = dt.datetime.now(dt.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    datestamp = amz_date[:8]
    payload_hash = _sha256_hex(payload)

    all_headers = {k.lower(): v.strip() for k, v in (headers or {}).items()}
    all_headers["host"] = host
    all_headers["x-amz-date"] = amz_date
    if service == "s3":
        # S3 requires the content hash header to be signed
        all_headers["x-amz-content-sha256"] = payload_hash
    if session_token:
        all_headers["x-amz-security-token"] = session_token

    signed_names = sorted(all_headers)
    canonical_headers = "".join(
        f"{k}:{all_headers[k]}\n" for k in signed_names
    )
    signed_headers = ";".join(signed_names)

    # canonical URI: S3 signs the raw transmitted path as-is (no
    # normalization, no re-encoding — the S3 exception in the spec);
    # other services RFC-3986-encode each path segment ('/' kept)
    if service == "s3":
        canonical_uri = parsed.path or "/"
    else:
        canonical_uri = quote(parsed.path or "/", safe="/")
    # canonical query: the URL's query is transmitted as-is, so the
    # canonical form is the raw (already strictly-encoded) pairs,
    # byte-sorted — re-quoting here would double-encode any '%' the
    # caller encoded (e.g. prefix=a%2Fb) and break the signature.
    # Callers must strictly RFC-3986-encode keys/values (safe "-_.~"),
    # as S3Store does; this matches botocore's canonical query for
    # URL-provided queries (sort only, no re-encode).
    pairs = []
    if parsed.query:
        for part in parsed.query.split("&"):
            k, _, v = part.partition("=")
            pairs.append((k, v))
    canonical_query = "&".join(f"{k}={v}" for k, v in sorted(pairs))

    canonical_request = "\n".join(
        [
            method.upper(),
            canonical_uri,
            canonical_query,
            canonical_headers,
            signed_headers,
            payload_hash,
        ]
    )
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            _sha256_hex(canonical_request.encode()),
        ]
    )
    k_date = _hmac(b"AWS4" + secret_key.encode(), datestamp)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    k_signing = _hmac(k_service, "aws4_request")
    signature = hmac.new(
        k_signing, string_to_sign.encode(), hashlib.sha256
    ).hexdigest()

    out = dict(all_headers)
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}"
    )
    return out
