"""Realtime face detection demo (reference: examples/facedet/demo.py).

    python examples/facedet/demo.py --source 0              # webcam
    python examples/facedet/demo.py --source video.mp4
    python examples/facedet/demo.py --source assets/testdata/sample.jpg \
        --out /tmp/facedet.png --min-size 20
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from common import build_argparser, draw_face_box, fps_loop, make_engine


def per_frame(cv2, frame, results):
    for res in results:
        draw_face_box(cv2, frame, res["face"])


def main():
    args = build_argparser(__doc__).parse_args()
    engine = make_engine(args.engine, with_pupils=False, with_landmarks=False)
    fps_loop(args, engine, per_frame, "pigo-tpu face detection")


if __name__ == "__main__":
    main()
