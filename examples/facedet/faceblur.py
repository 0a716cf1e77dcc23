"""Face anonymization (blur) demo (reference: examples/facedet/faceblur.py).

    python examples/facedet/faceblur.py --source 0
    python examples/facedet/faceblur.py --source assets/testdata/sample.jpg \
        --out /tmp/blur.png --min-size 20
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from common import build_argparser, fps_loop, make_engine


def per_frame(cv2, frame, results):
    h, w = frame.shape[:2]
    for res in results:
        r, c, s = (int(v) for v in res["face"][:3])
        r0, r1 = max(0, r - s // 2), min(h, r + s // 2)
        c0, c1 = max(0, c - s // 2), min(w, c + s // 2)
        if r1 > r0 and c1 > c0:
            k = max(3, (s // 8) | 1)  # odd kernel scaled to the face
            frame[r0:r1, c0:c1] = cv2.GaussianBlur(frame[r0:r1, c0:c1], (k, k), 0)


def main():
    args = build_argparser(__doc__).parse_args()
    engine = make_engine(args.engine, with_pupils=False, with_landmarks=False)
    fps_loop(args, engine, per_frame, "pigo-tpu face blur")


if __name__ == "__main__":
    main()
