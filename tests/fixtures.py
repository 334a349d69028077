"""Synthesized domain fixtures per FIXTURES.md A1/A3 — the offline
stand-ins for CMR responses and STAC items (the reference records
real traffic into VCR cassettes; we synthesize deterministic
equivalents)."""

from __future__ import annotations

import datetime as dt
import json
import os

TILES = ["15TWN", "15TWM", "31UDQ", "33KXQ", "56JKT", "04QFJ"]

#: approximate 100km-square centers (matches functions/mgrs decode) so
#: item geometry is geographically consistent with the tile id
TILE_CENTERS = {
    "15TWN": (-92.34, 47.40),
    "15TWM": (-92.35, 46.50),
    "31UDQ": (2.31, 49.20),
    "33KXQ": (16.46, -23.05),
    "56JKT": (150.53, -24.84),
    "04QFJ": (-157.55, 21.25),
}


def _stac_item(title: str, tile: str, day: dt.date, idx: int) -> dict:
    clon, clat = TILE_CENTERS[tile]
    lon0 = clon - 0.5
    lat0 = clat - 0.5
    ring = [
        [lon0, lat0],
        [lon0 + 1, lat0],
        [lon0 + 1, lat0 + 1],
        [lon0, lat0 + 1],
        [lon0, lat0],
    ]
    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": [],
        "id": title,
        "geometry": {"type": "Polygon", "coordinates": [ring]},
        "bbox": [lon0, lat0, lon0 + 1, lat0 + 1],
        "properties": {
            "datetime": f"{day.isoformat()}T17:04:39Z",
            "start_datetime": f"{day.isoformat()}T17:04:39Z",
            "end_datetime": f"{day.isoformat()}T17:05:03Z",
            "eo:cloud_cover": float(idx * 7 % 100),
        },
        "assets": {
            "B01": {"href": f"s3://bucket/{title}/B01.tif", "type": "image/tiff",
                    "title": "B01", "roles": ["data"]},
            "Fmask": {"href": f"s3://bucket/{title}/Fmask.tif", "type": "image/tiff",
                      "title": "Fmask", "roles": ["data"]},
        },
        "links": [{"rel": "self", "href": f"https://cmr/{title}"}],
    }


def make_fixtures(
    base_dir: str,
    collection_concept_id: str = "C2021957657-LPCLOUD",
    collection_id: str = "HLSL30_2.0",
    days: list[dt.date] | None = None,
    granules_per_day: int = 5,
    broken_stac_urls: int = 0,
) -> tuple[str, str]:
    """Write CMR fixture JSON (one file per day) + STAC item files.

    Returns (cmr_fixture_dir, stac_dir). Each granule gets an https
    file:// stac.json link plus an s3:// twin (protocol-filter test)
    and every 5th granule a malformed links entry (silent-skip test,
    cmr_api.py:89-104). ``broken_stac_urls`` granules per day point
    at a missing file (dead-letter test).
    """
    days = days or [dt.date(2025, 10, 1)]
    cmr_dir = os.path.join(base_dir, "cmr")
    stac_dir = os.path.join(base_dir, "stac")
    os.makedirs(cmr_dir, exist_ok=True)
    os.makedirs(stac_dir, exist_ok=True)

    for day in days:
        entries = []
        for i in range(granules_per_day):
            tile = TILES[i % len(TILES)]
            ts = f"{day.isoformat()}T17:04:{i:02d}"
            title = f"HLS.L30.T{tile}.{day.strftime('%Y%j')}T1704{i:02d}.v2.0"
            stac_path = os.path.join(stac_dir, f"{title}_stac.json")
            if i >= granules_per_day - broken_stac_urls:
                # ends with stac.json (passes link extraction) but the
                # file does not exist → exercises the dead-letter split
                stac_path = os.path.join(stac_dir, f"{title}_missing_stac.json")
            else:
                with open(os.path.join(stac_dir, f"{title}_stac.json"), "w") as f:
                    json.dump(_stac_item(title, tile, day, i), f)
            links = [
                {"rel": "http://esipfed.org/ns/fedsearch/1.1/data#",
                 "title": "Download", "hreflang": "en-US",
                 "href": f"s3://lp-prod-public/{title}/{title}_stac.json"},
                {"rel": "http://esipfed.org/ns/fedsearch/1.1/metadata#",
                 "title": "STAC JSON", "hreflang": "en-US",
                 "href": f"file://{stac_path}"},
            ]
            if i % 5 == 4:
                links.insert(0, {"rel": "broken"})  # malformed: no href
            entries.append(
                {
                    "id": f"G{3789984495 + i}-LPCLOUD",
                    "producer_granule_id": title[:-5],
                    "title": title,
                    "collection_concept_id": collection_concept_id,
                    "dataset_id": "HLS Landsat Operational Land Imager",
                    "data_center": "LPCLOUD",
                    "time_start": f"{ts}.000Z",
                    "time_end": f"{ts}.999Z",
                    "updated": f"{ts}.000Z",
                    "cloud_cover": str(i * 7 % 100),
                    "day_night_flag": "DAY",
                    "coordinate_system": "GEODETIC",
                    "browse_flag": True,
                    "online_access_flag": True,
                    "original_format": "ECHO10",
                    "polygons": [["46.0 -93.0 46.0 -92.0 47.0 -92.0 47.0 -93.0 46.0 -93.0"]],
                    "links": links,
                }
            )
        with open(os.path.join(cmr_dir, f"{day.isoformat()}.json"), "w") as f:
            json.dump({"feed": {"entry": entries}}, f)
    return cmr_dir, stac_dir
