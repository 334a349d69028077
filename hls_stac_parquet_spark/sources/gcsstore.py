"""Google Cloud Storage store (``gs://``) over the GCS XML API.

Completes the cloud-store matrix next to ``s3://``
(sources/s3store.py): GCS's XML API is interoperable with the S3
dialect this repo already speaks — same HEAD/PUT/GET/DELETE verbs,
same ListObjectsV2 paging (``list-type=2`` + continuation tokens),
same multipart upload handshake (CreateMultipartUpload/UploadPart/
CompleteMultipartUpload) — so :class:`GCSStore` subclasses
:class:`S3Store` and swaps ONLY the authentication: an OAuth2 bearer
token (service-account or workload-identity access token) instead of
SigV4.

``token_provider`` is any zero-arg callable returning a current
access token string — fetched per request batch so short-lived tokens
stay fresh (mirror of the S3 credential callable). For HMAC-key
interop auth, use :class:`S3Store` directly with
``endpoint="https://storage.googleapis.com/<bucket>"`` — GCS accepts
SigV4 with HMAC keys on the same endpoints.

Spark-side reads of the same objects go through Hadoop's ``gs://``
connector when the cluster has it (``spark_readable=True``).
"""

from __future__ import annotations

from typing import Callable
from urllib.parse import urlparse

from hls_stac_parquet_spark.sources.s3store import S3Store
from hls_stac_parquet_spark.store import register_store_scheme


class GCSStore(S3Store):
    """Store bound to ``gs://bucket[/prefix]`` (XML API, bearer auth).

    ``token_provider``: zero-arg callable → OAuth2 access token, or
    None for anonymous/public buckets. Picklable like the other
    stores (callable + strings), so executor tasks re-bind cheaply.
    """

    def __init__(
        self,
        url: str,
        token_provider: Callable[[], str] | None = None,
        endpoint: str | None = None,
        timeout: float = 60.0,
        spark_readable: bool = True,
        multipart_threshold: int | None = None,
        part_size: int | None = None,
        retry_attempts: int = 3,
    ):
        bucket = urlparse(url).netloc
        super().__init__(
            url,
            credentials=None,
            endpoint=(
                endpoint.rstrip("/")
                if endpoint
                else f"https://storage.googleapis.com/{bucket}"
            ),
            timeout=timeout,
            spark_readable=spark_readable,
            multipart_threshold=multipart_threshold,
            part_size=part_size,
            retry_attempts=retry_attempts,
        )
        self.token_provider = token_provider

    def _is_authed(self) -> bool:
        # exists(): 403 semantics mirror S3Store — with a token, a 403
        # is an auth failure and must raise, not read as "absent"
        return self.token_provider is not None

    def full_url(self, path: str) -> str:
        return f"gs://{self.bucket}/" + self._key(path)

    def spark_url(self, path: str = "") -> str | None:
        if not self.spark_readable:
            return None
        suffix = self._key(path) if path else self.prefix
        return f"gs://{self.bucket}/{suffix}".rstrip("/")

    def _auth_headers(
        self, method: str, url: str, data: bytes
    ) -> dict[str, str]:
        if self.token_provider is None:
            return {}
        return {"Authorization": f"Bearer {self.token_provider()}"}


def register_gcs_scheme(
    token_provider: Callable[[], str] | None = None,
    endpoint: str | None = None,
) -> None:
    """One-line deployment hook: make ``get_store("gs://…")`` work."""
    register_store_scheme(
        "gs",
        lambda url: GCSStore(
            url, token_provider=token_provider, endpoint=endpoint
        ),
    )
