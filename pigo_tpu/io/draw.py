"""Detection marker drawing (PIL), mirroring the reference CLI's gg drawing.

Reference: /root/reference/cmd/pigo/main.go drawFaces (:359-574) and
drawEyeDetectionMarker (:608-619). Markers: rect | circle | ellipse, red
2px stroke; eye dots red filled radius 0.15*scale (plus an optional yellow
box); landmark dots blue at half scale.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw

RED = (255, 0, 0, 255)
BLUE = (0, 0, 255, 255)
YELLOW = (255, 255, 0, 255)

MARKER_RECTANGLE = "rect"
MARKER_CIRCLE = "circle"
MARKER_ELLIPSE = "ellipse"


def draw_results(
    image: np.ndarray,  # RGBA/RGB uint8 [H, W, C]
    results,  # list[FaceResult]
    marker: str = MARKER_RECTANGLE,
    mark_eyes: bool = True,
) -> np.ndarray:
    img = Image.fromarray(np.asarray(image)).convert("RGBA")
    dc = ImageDraw.Draw(img)
    for res in results:
        f = res.face
        x, y, s = f.col, f.row, f.scale
        if marker == MARKER_CIRCLE:
            dc.ellipse([x - s / 2, y - s / 2, x + s / 2, y + s / 2],
                       outline=RED, width=2)
        elif marker == MARKER_ELLIPSE:
            dc.ellipse([x - s / 2, y - s / 1.6, x + s / 2, y + s / 1.6],
                       outline=RED, width=2)
        else:
            dc.rectangle([x - s / 2, y - s / 2, x + s / 2, y + s / 2],
                         outline=RED, width=2)
        for eye in res.eyes:
            r = eye.scale * 0.15
            dc.ellipse([eye.col - r, eye.row - r, eye.col + r, eye.row + r],
                       fill=RED)
            if mark_eyes:
                rr = eye.scale * 1.5
                dc.rectangle(
                    [eye.col - rr, eye.row - rr, eye.col + rr, eye.row + rr],
                    outline=YELLOW, width=2,
                )
        for p in res.landmarks:
            r = (p.scale * 0.5) * 0.15
            dc.ellipse([p.col - r, p.row - r, p.col + r, p.row + r], fill=BLUE)
    return np.asarray(img)
