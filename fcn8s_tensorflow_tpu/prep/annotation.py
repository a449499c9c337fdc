"""Polygon annotation data model.

Re-implements `/root/reference/cityscapesscripts/helpers/annotation.py:15-158`:
``Point``, ``CsObject`` (label + polygon + metadata with JSON round-trip) and
``Annotation`` (image dims + object list, ``from_json_file``).
"""

from __future__ import annotations

import json
from collections import namedtuple
from datetime import datetime

Point = namedtuple("Point", ["x", "y"])


class CsObject:
    """One annotated object: label string + polygon + metadata."""

    def __init__(self):
        self.label = ""
        self.polygon: list[Point] = []
        self.id = -1
        self.deleted = 0
        self.verified = 0
        self.date = ""
        self.user = ""
        self.draw = True

    def __str__(self):
        if not self.polygon:
            poly_text = "none"
        elif len(self.polygon) <= 4:
            poly_text = " ".join(f"({p.x},{p.y})" for p in self.polygon)
        else:
            p = self.polygon
            poly_text = (
                f"({p[0].x},{p[0].y}) ({p[1].x},{p[1].y}) ... "
                f"({p[-2].x},{p[-2].y}) ({p[-1].x},{p[-1].y})"
            )
        return f"Object: {self.label} - {poly_text}"

    def from_json_text(self, data: dict, obj_id: int) -> None:
        self.id = obj_id
        self.label = str(data["label"])
        self.polygon = [Point(p[0], p[1]) for p in data["polygon"]]
        self.deleted = data.get("deleted", 0)
        self.verified = data.get("verified", 1)
        self.user = data.get("user", "")
        self.date = data.get("date", "")
        self.draw = not self.deleted

    def to_json_text(self) -> dict:
        return {
            "label": self.label,
            "id": self.id,
            "deleted": self.deleted,
            "verified": self.verified,
            "user": self.user,
            "date": self.date,
            "polygon": [[pt.x, pt.y] for pt in self.polygon],
        }

    def update_date(self) -> None:
        self.date = datetime.now().strftime("%d-%b-%Y %H:%M:%S")


class Annotation:
    """Whole-image annotation: dimensions + object list."""

    def __init__(self):
        self.imgWidth = 0
        self.imgHeight = 0
        self.objects: list[CsObject] = []

    def entry(self) -> dict:
        return {
            "imgWidth": self.imgWidth,
            "imgHeight": self.imgHeight,
            "objects": [obj.to_json_text() for obj in self.objects],
        }

    def from_json_text(self, json_text: str) -> None:
        data = json.loads(json_text)
        self.imgWidth = int(data["imgWidth"])
        self.imgHeight = int(data["imgHeight"])
        self.objects = []
        for obj_id, obj_data in enumerate(data["objects"]):
            obj = CsObject()
            obj.from_json_text(obj_data, obj_id)
            self.objects.append(obj)

    def to_json(self) -> str:
        return json.dumps(self.entry(), default=str)

    def from_json_file(self, json_file: str) -> None:
        with open(json_file) as f:
            self.from_json_text(f.read())

    # camelCase aliases matching the reference API names
    fromJsonFile = from_json_file
    toJson = to_json
