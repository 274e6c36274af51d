"""DASH MPD manifest: builder (sender) and parser (receiver).

Live-profile dynamic MPD with one point-cloud AdaptationSet and a
SegmentTemplate ``ID$RepresentationID$/segment-$Number$.bin`` — the manifest
surface of the reference (``sender/media_server/mpd_manager.py`` writer,
``receiver/client/mpd_parser.py`` reader): representation 0 is the raw
passthrough (``codecs="raw"``), others the learned codec
(``codecs="unified"``), with live per-representation bandwidth updates.
Implemented with stdlib ElementTree; files are written atomically.
"""

from __future__ import annotations

import os
import time
import xml.etree.ElementTree as ET
from typing import Optional

import urllib.request

MPD_NS = "urn:mpeg:dash:schema:mpd:2011"


class MPDManager:
    def __init__(self, segment_duration: float = 1.0, availability_offset: float = 0.0):
        self.segment_duration = segment_duration
        self.mpd = ET.Element(
            "MPD",
            {
                "xmlns": MPD_NS,
                "type": "dynamic",
                "profiles": "urn:mpeg:dash:profile:isoff-live:2011",
                "availabilityStartTime": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
                "minimumUpdatePeriod": f"PT{segment_duration}S",
                "minBufferTime": f"PT{2 * segment_duration}S",
            },
        )
        self.period = ET.SubElement(self.mpd, "Period", {"id": "0", "start": "PT0S"})
        self.adaptation_set: Optional[ET.Element] = None
        self.template: Optional[ET.Element] = None

    def setup_adaptation_set(self) -> None:
        self.adaptation_set = ET.SubElement(
            self.period,
            "AdaptationSet",
            {"id": "0", "mimeType": "pointcloud/custom", "segmentAlignment": "true"},
        )
        self.template = ET.SubElement(
            self.adaptation_set,
            "SegmentTemplate",
            {
                "media": "ID$RepresentationID$/segment-$Number$.bin",
                "duration": str(self.segment_duration),
                "startNumber": "0",
                "timescale": "1",
            },
        )

    def add_representation(self, rep_id: int, codecs: str, bandwidth: int = 0) -> None:
        assert self.adaptation_set is not None, "call setup_adaptation_set first"
        ET.SubElement(
            self.adaptation_set,
            "Representation",
            {"id": str(rep_id), "codecs": codecs, "bandwidth": str(bandwidth)},
        )

    def update_metadata(self, rep_id: int, bandwidth: int) -> None:
        for rep in self.adaptation_set.findall("Representation"):
            if rep.get("id") == str(rep_id):
                rep.set("bandwidth", str(int(bandwidth)))

    def update_segment(self, number: int) -> None:
        # fractional seconds: two publishes within one wall second must still
        # produce distinct publishTime values (the client's download gate)
        t = time.time()
        frac = f"{t % 1:.3f}"[1:]  # ".123"
        self.mpd.set(
            "publishTime",
            time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(t)) + frac + "Z",
        )
        self.mpd.set("latestSegmentNumber", str(number))

    def save_mpd(self, path: str) -> None:
        tmp = path + ".tmp"
        ET.ElementTree(self.mpd).write(tmp, xml_declaration=True, encoding="utf-8")
        os.replace(tmp, path)


class MPDParser:
    """Fetch + parse the manifest into nested dicts (3-retry like reference
    ``mpd_parser.py:27-41``)."""

    def __init__(self, url: str, retries: int = 3):
        self.url = url
        self.retries = retries
        self.mpd: dict = {}

    def update_mpd(self) -> bool:
        for _ in range(self.retries):
            try:
                with urllib.request.urlopen(self.url, timeout=5) as r:
                    self.mpd = self.parse_mpd(r.read())
                return True
            except Exception:
                time.sleep(0.1)
        return False

    @staticmethod
    def parse_mpd(data: bytes) -> dict:
        root = ET.fromstring(data)

        def strip(tag):
            return tag.split("}", 1)[-1]

        out = {
            "type": root.get("type"),
            "publishTime": root.get("publishTime"),
            "availabilityStartTime": root.get("availabilityStartTime"),
            "latestSegmentNumber": root.get("latestSegmentNumber"),
            "periods": [],
        }
        for period in root:
            if strip(period.tag) != "Period":
                continue
            p = {"id": period.get("id"), "adaptation_sets": []}
            for aset in period:
                if strip(aset.tag) != "AdaptationSet":
                    continue
                a = {
                    "id": aset.get("id"),
                    "mimeType": aset.get("mimeType"),
                    "segment_template": None,
                    "representations": [],
                }
                for child in aset:
                    t = strip(child.tag)
                    if t == "SegmentTemplate":
                        a["segment_template"] = dict(child.attrib)
                    elif t == "Representation":
                        a["representations"].append(
                            {
                                "id": child.get("id"),
                                "codecs": child.get("codecs"),
                                "bandwidth": int(child.get("bandwidth") or 0),
                            }
                        )
                p["adaptation_sets"].append(a)
            out["periods"].append(p)
        return out

    # convenience getters (reference MPDParser.get_* surface)
    def get_representations(self) -> list[dict]:
        try:
            return self.mpd["periods"][0]["adaptation_sets"][0]["representations"]
        except (KeyError, IndexError):
            return []

    def get_segment_template(self) -> dict | None:
        try:
            return self.mpd["periods"][0]["adaptation_sets"][0]["segment_template"]
        except (KeyError, IndexError):
            return None

    def get_segment_duration(self) -> float:
        t = self.get_segment_template() or {}
        return float(t.get("duration", 1.0)) / float(t.get("timescale", 1.0))
