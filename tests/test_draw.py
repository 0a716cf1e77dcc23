"""Marker drawing tests, incl. the rotated eye-zone overlay.

Reference behavior: /root/reference/cmd/pigo/main.go drawFaces (:359-574);
for angle > 0 the eye markers are drawn on a face-sized transparent canvas,
rotated by 2*(angle*180/pi) degrees, flipped horizontally, and composited at
the face box corner (:424-480). Landmarks always render upright.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from PIL import Image, ImageDraw

from pigo_tpu.detector import Detection, FaceResult
from pigo_tpu.io.draw import draw_results
from pigo_tpu.models.pupil import Puploc


def _result():
    face = Detection(row=100, col=100, scale=120, q=10.0)
    eyes = [Puploc(row=85, col=75, scale=12.0),
            Puploc(row=85, col=125, scale=12.0)]
    lmk = [Puploc(row=130, col=100, scale=24.0)]
    return FaceResult(face=face, eyes=eyes, landmarks=lmk)


def _canvas():
    return np.full((200, 200, 4), 255, dtype=np.uint8)


def test_upright_markers_pixels():
    out = draw_results(_canvas(), [_result()], mark_eyes=False)
    # red pupil dots at the eye coordinates
    assert tuple(out[85, 75]) == (255, 0, 0, 255)
    assert tuple(out[85, 125]) == (255, 0, 0, 255)
    # blue landmark dot
    assert tuple(out[130, 100]) == (0, 0, 255, 255)
    # red face box edge (col = 100 - 120/2 = 40)
    assert tuple(out[100, 40]) == (255, 0, 0, 255)


def test_rotated_overlay_moves_eye_markers():
    res = _result()
    upright = draw_results(_canvas(), [res], mark_eyes=False, angle=0.0)
    rotated = draw_results(_canvas(), [res], mark_eyes=False, angle=0.125)
    assert not np.array_equal(upright, rotated)
    # the upright left-eye dot position is vacated by the rotation
    assert tuple(rotated[85, 75]) != (255, 0, 0, 255)
    # landmarks stay upright in both
    assert tuple(rotated[130, 100]) == (0, 0, 255, 255)
    # face box stays axis-aligned in both
    assert tuple(rotated[100, 40]) == (255, 0, 0, 255)


@pytest.mark.parametrize("angle", [0.125, 0.25])
def test_rotated_overlay_matches_reference_recipe(angle):
    """Pixel-exact cross-check against an independent statement of the
    reference compositing recipe (scratch zone accumulates across eyes;
    rotate 2*(angle*180/pi) deg CCW, flip horizontally, paste at the face
    box corner — main.go:424-480)."""
    res = _result()
    out = draw_results(_canvas(), [res], mark_eyes=False, angle=angle)

    img = Image.fromarray(_canvas()).convert("RGBA")
    dc = ImageDraw.Draw(img)
    f = res.face
    x, y, s = f.col, f.row, f.scale
    dc.rectangle([x - s / 2, y - s / 2, x + s / 2, y + s / 2],
                 outline=(255, 0, 0, 255), width=2)
    zone = Image.new("RGBA", (s, s), (0, 0, 0, 0))
    zdc = ImageDraw.Draw(zone)
    for eye in res.eyes:
        r = eye.scale * 0.15
        ec = s / 2 - (x - eye.col)
        er = s / 2 - (y - eye.row)
        zdc.ellipse([ec - r, er - r, ec + r, er + r], fill=(255, 0, 0, 255))
        rot = zone.rotate(2.0 * (angle * 180.0 / math.pi), expand=True,
                          resample=Image.BILINEAR)
        img.alpha_composite(rot.transpose(Image.FLIP_LEFT_RIGHT),
                            (int(x - s / 2), int(y - s / 2)))
    for p in res.landmarks:
        r = (p.scale * 0.5) * 0.15
        dc.ellipse([p.col - r, p.row - r, p.col + r, p.row + r],
                   fill=(0, 0, 255, 255))
    assert np.array_equal(out, np.asarray(img))
