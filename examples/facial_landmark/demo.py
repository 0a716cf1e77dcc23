"""Facial landmark points demo (reference: examples/facial_landmark/flploc.py).

Draws the 15-point landmark set (5 eye cascades x2 flips, 4 mouth, nose).

    python examples/facial_landmark/demo.py --source 0
    python examples/facial_landmark/demo.py --source assets/testdata/sample.jpg \
        --out /tmp/flp.png --min-size 20
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from common import build_argparser, draw_face_box, draw_point, fps_loop, make_engine


def per_frame(cv2, frame, results):
    for res in results:
        draw_face_box(cv2, frame, res["face"])
        for eye in res["eyes"]:
            draw_point(cv2, frame, eye, color=(0, 0, 255))
        for pt in res["landmarks"]:
            draw_point(cv2, frame, pt, color=(255, 0, 0), radius=3)


def main():
    args = build_argparser(__doc__).parse_args()
    engine = make_engine(args.engine, with_pupils=True, with_landmarks=True)
    fps_loop(args, engine, per_frame, "pigo-tpu facial landmarks")


if __name__ == "__main__":
    main()
