"""Minimal COCO-format annotation index (replaces xtcocotools for the subset
of the API the datasets use: getImgIds / getAnnIds / loadAnns / loadImgs /
getCatIds / loadCats / imgs).

Reference dependency surface: datasets/base_dataset.py:89-107.
"""

from __future__ import annotations

import json
from collections import defaultdict


class COCO:
    def __init__(self, annotation_file: str):
        with open(annotation_file) as f:
            self.dataset = json.load(f)
        self.anns = {}
        self.imgs = {}
        self.cats = {}
        self.img_to_anns = defaultdict(list)
        for img in self.dataset.get("images", []):
            self.imgs[img["id"]] = img
        for i, ann in enumerate(self.dataset.get("annotations", [])):
            ann_id = ann.get("id", i)
            self.anns[ann_id] = ann
            self.img_to_anns[ann["image_id"]].append(ann_id)
        for cat in self.dataset.get("categories", []):
            self.cats[cat["id"]] = cat

    def getImgIds(self):
        return sorted(self.imgs)

    def getCatIds(self):
        return sorted(self.cats)

    def loadCats(self, ids):
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.cats[i] for i in ids]

    def getAnnIds(self, imgIds=None, iscrowd=None):
        if imgIds is None:
            ids = sorted(self.anns)
        else:
            if not isinstance(imgIds, (list, tuple)):
                imgIds = [imgIds]
            ids = [a for i in imgIds for a in self.img_to_anns[i]]
        if iscrowd is not None:
            ids = [
                a for a in ids
                if bool(self.anns[a].get("iscrowd", 0)) == bool(iscrowd)
            ]
        return ids

    def loadAnns(self, ids):
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.anns[i] for i in ids]

    def loadImgs(self, ids):
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.imgs[i] for i in ids]
