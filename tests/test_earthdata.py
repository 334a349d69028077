"""Earthdata credential provider + SigV4 signer (sources/earthdata.py)
— the concrete implementation of the reference's per-netloc
credentialed fetch (fetch.py:39-48), offline via a local HTTP server
and the published AWS SigV4 test vector."""

from __future__ import annotations

import datetime as dt
import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from hls_stac_parquet_spark.sources.earthdata import (
    EarthdataCredentialProvider,
    fetch_s3_credentials,
    sigv4_headers,
)

CREDS = {
    "accessKeyId": "ASIAFAKE",
    "secretAccessKey": "fakeSecret",
    "sessionToken": "fakeToken",
    "expiration": "2030-01-01 00:00:00+00:00",
}


@pytest.fixture()
def creds_server():
    """Local stand-in for the Earthdata s3credentials endpoint;
    records Authorization headers and counts hits."""
    hits = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.headers.get("Authorization"))
            body = json.dumps(CREDS).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}/s3credentials", hits
    finally:
        srv.shutdown()


def test_fetch_s3_credentials_sends_bearer(creds_server):
    url, hits = creds_server
    got = fetch_s3_credentials(url, token="tok123")
    assert got == CREDS
    assert hits == ["Bearer tok123"]


def test_provider_bearer_headers_scoped_to_earthdata_hosts():
    p = EarthdataCredentialProvider(token="tok")
    assert p("data.lpdaac.earthdatacloud.nasa.gov") == {
        "Authorization": "Bearer tok"
    }
    assert p("cmr.earthdata.nasa.gov:443") == {"Authorization": "Bearer tok"}
    # non-Earthdata hosts stay anonymous — no token leakage
    assert p("example.com") is None
    assert p("nasa.gov.evil.example") is None
    # no token configured → anonymous everywhere
    assert EarthdataCredentialProvider()("cmr.earthdata.nasa.gov") is None


def test_provider_caches_until_expiry_margin(creds_server):
    url, hits = creds_server
    p = EarthdataCredentialProvider(token="tok", credentials_url=url)
    t0 = dt.datetime(2029, 12, 31, 0, 0, tzinfo=dt.timezone.utc)
    assert p.s3_credentials(now=t0)["accessKeyId"] == "ASIAFAKE"
    p.s3_credentials(now=t0 + dt.timedelta(hours=1))
    assert len(hits) == 1  # cached — one fetch
    # inside the 300s refresh margin before expiration → re-fetch
    p.s3_credentials(
        now=dt.datetime(2029, 12, 31, 23, 57, tzinfo=dt.timezone.utc)
    )
    assert len(hits) == 2


def test_provider_pickles_without_cache(creds_server):
    url, hits = creds_server
    p = EarthdataCredentialProvider(token="tok", credentials_url=url)
    p.s3_credentials(
        now=dt.datetime(2029, 1, 1, tzinfo=dt.timezone.utc)
    )
    clone = pickle.loads(pickle.dumps(p))
    assert clone.token == "tok" and clone._creds is None
    assert clone("cmr.earthdata.nasa.gov") == {"Authorization": "Bearer tok"}


def test_provider_plugs_into_fetch_seam(spark, creds_server, tmp_path):
    """End-to-end through sources/stac_fetch.py: Earthdata hosts are
    fetched with the Bearer header, other hosts anonymously."""
    from tests.fixtures import make_fixtures
    from hls_stac_parquet_spark.sources.stac_fetch import fetch_stac_items

    make_fixtures(str(tmp_path), days=[dt.date(2025, 10, 1)],
                  granules_per_day=2)
    # file:// URLs exercise the anonymous path through the seam
    import glob as g

    urls = [
        f"file://{p}"
        for p in sorted(g.glob(str(tmp_path / "stac" / "*.json")))[:2]
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    p = EarthdataCredentialProvider(token="tok")
    fetched = fetch_stac_items(df, credential_provider=p)
    ok = fetched.filter("fetch_error IS NULL")
    assert ok.count() == len(urls)


# --- SigV4 --------------------------------------------------------------


def test_sigv4_official_aws_doc_vector():
    """The published AWS 'GET iam' SigV4 example (docs.aws.amazon.com
    signature-version-4 test suite) — exact signature match."""
    out = sigv4_headers(
        "GET",
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        service="iam",
        headers={
            "Content-Type": "application/x-www-form-urlencoded; charset=utf-8"
        },
        amz_date="20150830T123600Z",
    )
    assert out["Authorization"] == (
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/"
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5"
        "924a6f2b5d7"
    )


def test_sigv4_matches_botocore():
    """Cross-validate the stdlib signer against botocore on S3-shaped
    requests (skipped when botocore is absent)."""
    pytest.importorskip("botocore")
    import datetime as real_dt
    from unittest import mock

    import botocore.auth
    from botocore.auth import S3SigV4Auth
    from botocore.awsrequest import AWSRequest
    from botocore.credentials import Credentials

    cases = [
        ("GET", "https://bucket.s3.us-west-2.amazonaws.com/key/a.parquet",
         None),
        ("GET", "https://bucket.s3.us-west-2.amazonaws.com/"
                "prefix/y=2025/m=10/f.parquet?versionId=abc123", "tokTOK"),
        ("HEAD", "https://bucket.s3.us-west-2.amazonaws.com/x-y.json",
         None),
        # percent-encoded query values (the S3Store list/pagination
        # shape): the canonical query must use the raw encoded pairs,
        # not re-quote them ('%2F' -> '%252F' broke real-AWS listing)
        ("GET", "https://bucket.s3.us-west-2.amazonaws.com/"
                "?list-type=2&prefix=a%2Fb%2F", None),
        ("GET", "https://bucket.s3.us-west-2.amazonaws.com/"
                "?continuation-token=1%2FsjX%3D%3D&list-type=2"
                "&prefix=hls%2Fmonth%3D2025-01%2F", "tokTOK"),
        # unsorted input pairs with encoded '=' padding in the value
        ("GET", "https://bucket.s3.us-west-2.amazonaws.com/"
                "?prefix=z%20q&delimiter=%2F&list-type=2", None),
    ]
    frozen = real_dt.datetime(2025, 1, 15, 10, 15, 0)
    amz_date = "20250115T101500Z"
    for method, url, session_token in cases:
        mine = sigv4_headers(
            method, url,
            access_key="AKIDEXAMPLE",
            secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
            session_token=session_token,
            region="us-west-2", service="s3",
            amz_date=amz_date,
        )
        creds = Credentials(
            "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
            token=session_token,
        )
        req = AWSRequest(method=method, url=url)
        with mock.patch.object(
            botocore.auth, "get_current_datetime", return_value=frozen
        ):
            S3SigV4Auth(creds, "s3", "us-west-2").add_auth(req)
        theirs = dict(req.headers)
        assert mine["Authorization"] == theirs["Authorization"], (method, url)
