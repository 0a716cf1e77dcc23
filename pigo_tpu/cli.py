"""pigo-tpu command-line interface.

Mirrors the reference CLI flag set and behavior
(/root/reference/cmd/pigo/main.go:105-119; README.md:157-185):

    pigo-tpu -in input.jpg -out out.png -cf assets/cascade/facefinder \
             -plc assets/cascade/puploc -flpc assets/cascade/lps \
             -min 20 -max 1000 -shift 0.15 -scale 1.15 -angle 0.0 \
             -iou 0.15 -marker rect -mark -json -

`-in -` / `-out -` / `-json -` use stdin/stdout pipes. `-in` also accepts an
http(s) URL. Cascade files are content-sniffed before unpacking
(main.go:301-307). Detections print as the reference's JSON schema.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
import urllib.request

import numpy as np

BANNER = r"""
┌─┐┬┌─┐┌─┐   ┌┬┐┌─┐┬ ┬
├─┘││ ┬│ │───│ ├─┘│ │
┴  ┴└─┘└─┘   ┴ ┴  └─┘

TPU-native face detection (PICO cascades on JAX/Pallas).
"""

PIPE = "-"


def detect_file_content_type(path: str) -> str:
    """Sniff like Go's http.DetectContentType over the first 512 bytes
    (utils/utils.go:57-78): binary cascades must be octet-stream."""
    with open(path, "rb") as fh:
        head = fh.read(512)
    for sig, ctype in (
        (b"\xff\xd8\xff", "image/jpeg"),
        (b"\x89PNG\r\n\x1a\n", "image/png"),
        (b"GIF8", "image/gif"),
        (b"%PDF", "application/pdf"),
    ):
        if head.startswith(sig):
            return ctype
    try:
        head.decode("utf-8")
        return "text/plain; charset=utf-8"
    except UnicodeDecodeError:
        return "application/octet-stream"


def is_valid_url(s: str) -> bool:
    return s.startswith("http://") or s.startswith("https://")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pigo-tpu", description=BANNER,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("-in", dest="source", default=PIPE, help="Source image")
    p.add_argument("-out", dest="dest", default=PIPE, help="Destination image")
    p.add_argument("-cf", dest="cascade_file", default="",
                   help="Cascade binary file")
    p.add_argument("-min", dest="min_size", type=int, default=20,
                   help="Minimum size of face")
    p.add_argument("-max", dest="max_size", type=int, default=1000,
                   help="Maximum size of face")
    p.add_argument("-shift", dest="shift_factor", type=float, default=0.15,
                   help="Shift detection window by percentage")
    p.add_argument("-scale", dest="scale_factor", type=float, default=1.15,
                   help="Scale detection window by percentage")
    p.add_argument("-angle", type=float, default=0.0,
                   help="0.0 is 0 radians and 1.0 is 2*pi radians")
    p.add_argument("-iou", dest="iou_threshold", type=float, default=0.15,
                   help="Intersection over union (IoU) threshold")
    p.add_argument("-marker", default="rect",
                   help="Detection marker: rect|circle|ellipse")
    p.add_argument("-plc", dest="puploc", default="",
                   help="Pupils/eyes localization cascade file")
    p.add_argument("-flpc", dest="flploc", default="",
                   help="Facial landmark points cascade directory")
    p.add_argument("-mark", dest="mark_eyes", default=True,
                   type=lambda v: v not in ("false", "0", "no"),
                   help="Mark detected eyes")
    p.add_argument("-json", dest="jsonf", default="",
                   help="Output the detection points into a json file")
    p.add_argument("-json-accumulate", dest="json_accumulate",
                   action="store_true",
                   help="Bug-for-bug reference JSON: face i carries the "
                        "eye/landmark points of faces 0..i (the reference "
                        "CLI never resets its coord slices, "
                        "cmd/pigo/main.go:363-365)")
    p.add_argument("-seed", type=int, default=0,
                   help="PRNG seed for the perturbation ensemble")
    return p


def read_source(source: str) -> bytes:
    if is_valid_url(source):
        with urllib.request.urlopen(source) as resp:  # noqa: S310
            return resp.read()
    if source == PIPE:
        if sys.stdin.isatty():
            raise SystemExit("`-` should be used with a pipe for stdin")
        return sys.stdin.buffer.read()
    with open(source, "rb") as fh:
        return fh.read()


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.cascade_file:
        print("Usage: pigo-tpu -in input.jpg -out out.png -cf cascade/facefinder",
              file=sys.stderr)
        return 2

    # PIGO_TPU_PLATFORM pins the backend BEFORE the model imports below:
    # several modules build device constants at import, which would
    # otherwise initialize the default accelerator backend first.
    from pigo_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.draw import draw_results
    from pigo_tpu.io.image import decode_image, rgb_to_grayscale
    from pigo_tpu.models.face import FaceCascade
    from pigo_tpu.models.landmark import LandmarkLocalizer
    from pigo_tpu.models.pupil import PupilLocalizer
    from pigo_tpu.cascade.assets import load_landmark_dir
    from pigo_tpu.utils.spinner import Spinner
    import jax
    from PIL import Image

    start = time.time()
    spinner = Spinner("Processing...")
    spinner.start()

    def fail(msg: str) -> int:
        # stop BEFORE writing: the spinner thread redraws the current
        # stderr line and its cleanup would erase the message
        spinner.stop()
        print(msg, file=sys.stderr)
        return 1

    try:
        if detect_file_content_type(args.cascade_file) != "application/octet-stream":
            return fail("the provided cascade classifier is not valid")

        face = FaceCascade.from_file(args.cascade_file)
        pupil = None
        landmarks = None
        if args.puploc:
            pupil = PupilLocalizer.from_file(args.puploc)
        if args.flploc:
            if pupil is None:
                return fail(
                    "the puploc cascade file is required: use the -plc flag")
            landmarks = LandmarkLocalizer(load_landmark_dir(args.flploc))

        det = FaceDetector(face=face, pupil=pupil, landmarks=landmarks,
                           with_pupils=pupil is not None,
                           with_landmarks=landmarks is not None)

        img = decode_image(read_source(args.source))
        rows, cols = img.shape[0], img.shape[1]
        gray = rgb_to_grayscale(img)

        results = det.detect(
            gray, rows, cols,
            CascadeParams(args.min_size, args.max_size,
                          args.shift_factor, args.scale_factor),
            angle=args.angle, iou_threshold=args.iou_threshold,
            key=jax.random.PRNGKey(args.seed),
        )

        if args.dest != "empty":
            annotated = draw_results(img, results, args.marker,
                                     args.mark_eyes, angle=args.angle)
            out_img = Image.fromarray(annotated)
            if args.dest == PIPE:
                if sys.stdout.isatty():
                    return fail("`-` should be used with a pipe for stdout")
                buf = io.BytesIO()
                out_img.convert("RGB").save(buf, format="JPEG", quality=100)
                sys.stdout.buffer.write(buf.getvalue())
            else:
                ext = os.path.splitext(args.dest.lower())[1]
                if ext not in ("", ".jpg", ".jpeg", ".png"):
                    return fail(f"Output file type not supported: {ext}")
                if ext == ".png":
                    out_img.save(args.dest, format="PNG")
                else:
                    out_img.convert("RGB").save(args.dest, format="JPEG",
                                                quality=100)

        spinner.stop()
        payload = [r.to_json_dict() for r in results]
        if args.json_accumulate:
            from pigo_tpu.detector import accumulate_json_payload

            payload = accumulate_json_payload(payload)
        if args.jsonf:
            text = json.dumps(payload)
            if args.jsonf == PIPE:
                print(text)
            else:
                with open(args.jsonf, "w") as fh:
                    fh.write(text + "\n")

        n = len(payload)
        if n:
            print(f"\n{n} face(s) detected", file=sys.stderr)
        else:
            print("\nno detected faces!", file=sys.stderr)
        print(f"Execution time: {time.time() - start:.2f}s", file=sys.stderr)
        return 0
    finally:
        spinner.stop()


if __name__ == "__main__":
    raise SystemExit(main())
