"""Blink detection demo (reference: examples/blinkdet/blinkdet.py).

Like the reference, a blink is flagged when a localized pupil position stops
yielding a Hough-circle (iris) match for a few consecutive frames on one side.

    python examples/blinkdet/demo.py --source 0
    python examples/blinkdet/demo.py --source video.mp4 --out /tmp/blink.mp4
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from common import build_argparser, draw_face_box, draw_point, fps_loop, make_engine

EYE_CLOSED_CONSEC_FRAMES = 2

state = {"left": EYE_CLOSED_CONSEC_FRAMES, "right": EYE_CLOSED_CONSEC_FRAMES}


def iris_visible(cv2, frame, eye) -> bool:
    """HoughCircles iris check around the localized pupil (reference
    blinkdet.py:84-96)."""
    r, c, s = int(eye[0]), int(eye[1]), max(4, int(eye[2]))
    pad = int(s * 1.2)
    sub = frame[max(0, r - pad):r + pad, max(0, c - pad):c + pad]
    if sub.size == 0:
        return False
    gray = cv2.cvtColor(sub, cv2.COLOR_BGR2GRAY)
    max_radius = max(5, int(s * 0.45))
    circles = cv2.HoughCircles(
        cv2.medianBlur(gray, 1), cv2.HOUGH_GRADIENT, 1, max_radius,
        param1=60, param2=21, minRadius=4, maxRadius=max_radius)
    return circles is not None


def per_frame(cv2, frame, results):
    for res in results:
        draw_face_box(cv2, frame, res["face"])
        face_col = res["face"][1]
        for eye in res["eyes"]:
            side = "left" if eye[1] < face_col else "right"
            if iris_visible(cv2, frame, eye):
                state[side] += 1
            else:
                state[side] = 0
            draw_point(cv2, frame, eye, color=(0, 0, 255))
        if state["left"] < EYE_CLOSED_CONSEC_FRAMES:
            cv2.putText(frame, "Left blink!", (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 255), 2)
        if state["right"] < EYE_CLOSED_CONSEC_FRAMES:
            cv2.putText(frame, "Right blink!", (frame.shape[1] - 150, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 255), 2)


def main():
    args = build_argparser(__doc__).parse_args()
    engine = make_engine(args.engine, with_pupils=True, with_landmarks=False)
    fps_loop(args, engine, per_frame, "pigo-tpu blink detector")


if __name__ == "__main__":
    main()
