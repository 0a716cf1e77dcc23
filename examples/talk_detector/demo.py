"""Talk detection demo (reference: examples/talk_detector/talkdet.py).

Computes the mouth aspect ratio from the mouth landmark points; a ratio
below the threshold means the mouth is open ("talking") — the reference's
`mar = (dist1/dist2) * 0.19 < 0.4` heuristic (talkdet.go:105-122).

    python examples/talk_detector/demo.py --source 0
    python examples/talk_detector/demo.py --source video.mp4 --out /tmp/talk.mp4
"""

import math
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from common import (
    MOUTH_CASCADES,
    build_argparser,
    draw_face_box,
    draw_point,
    fps_loop,
    make_engine,
)

MAR_SCALE = 0.19
MAR_THRESHOLD = 0.4

# landmark list layout (common.py _landmarks / TpuEngine): 10 eye points,
# then the 4 mouth points (lp81, lp82, lp84, lp93), then the flipped nose.
MOUTH_SLICE = slice(10, 10 + len(MOUTH_CASCADES))


def mouth_aspect_ratio(mouth_pts) -> float:
    """dist(lp82, nose-flip) / dist(lp84, lp93) * 0.19, mirroring the point
    pairs the reference picks out of its accumulated mouth list."""
    if len(mouth_pts) < 4:
        return float("inf")
    p1, p3 = mouth_pts[1], mouth_pts[2]
    p2, p4 = mouth_pts[-1], mouth_pts[-2]
    dist1 = math.hypot(p2[0] - p1[0], p2[1] - p1[1])
    dist2 = math.hypot(p4[0] - p3[0], p4[1] - p3[1])
    if dist2 == 0:
        return float("inf")
    return dist1 / dist2 * MAR_SCALE


def per_frame(cv2, frame, results):
    for res in results:
        draw_face_box(cv2, frame, res["face"])
        pts = res["landmarks"]
        mouth = pts[MOUTH_SLICE] + pts[-1:]  # 4 mouth points + flipped nose
        for pt in mouth:
            draw_point(cv2, frame, pt, color=(255, 0, 0), radius=3)
        if mouth_aspect_ratio(mouth) < MAR_THRESHOLD:
            cv2.putText(frame, "Talking!", (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.9, (0, 0, 255), 2)


def main():
    args = build_argparser(__doc__).parse_args()
    engine = make_engine(args.engine, with_pupils=True, with_landmarks=True)
    fps_loop(args, engine, per_frame, "pigo-tpu talk detector")


if __name__ == "__main__":
    main()
