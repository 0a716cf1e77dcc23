"""Web demos: MJPEG stream + in-browser webcam detection page.

Covers both reference web surfaces in one server:

  * `/cam`    — annotated MJPEG multipart stream from a server-side source
                (reference examples/web/main.go:71-160, which pipes webcam
                frames through detection and re-encodes them).
  * `/`       — browser webcam page: getUserMedia -> canvas -> POST frames to
                /detect -> draw results client-side, with the reference WASM
                demo's keybindings (reference wasm/canvas/canvas.go:256-282):
                e = eyes, f = landmarks, c = boxes; plus an FPS meter.
  * `/detect` — POST image bytes -> JSON detection results (the reference
                JSON schema, cmd/pigo/main.go:89-100).
  * `/?engine=client` — fully client-side detection: the pure-JS PICO
                engine (static/pico.js) runs faces/pupils/landmarks in the
                browser with NO server round trip (the reference WASM
                surface, wasm/detector/detector.go:33-190); cascades are
                served at `/cascade/...` like the reference dev server
                (wasm/http/serve.go:17-57).
  * `/selftest` — in-browser engine verification: pico.js vs the frozen
                golden fixture (bit-exact face path, tolerance ensembles).

    python examples/web/main.py --source video.mp4 --port 5000
"""

import io
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from common import build_argparser, make_engine

PAGE = """<!DOCTYPE html>
<html><head><title>pigo-tpu web demo</title><style>
body { background: #111; color: #eee; font-family: monospace; text-align: center }
canvas { border: 1px solid #444 }
</style></head><body>
<h3>pigo-tpu — browser webcam detection</h3>
<p>keys: <b>c</b> boxes | <b>e</b> pupils | <b>f</b> landmarks &nbsp;
<span id="fps">0</span> FPS &nbsp; <span id="engine"></span></p>
<video id="v" autoplay playsinline style="display:none"></video>
<canvas id="cv" width="640" height="480"></canvas>
<p>No webcam? Watch the server-side stream at <a href="/cam">/cam</a>.
Engine: <a href="/?engine=server">server</a> |
<a href="/?engine=client">client (pico.js, no round trips)</a> |
<a href="/selftest">self-test</a></p>
<script src="/static/pico.js"></script>
<script>
const v = document.getElementById('v'), cv = document.getElementById('cv');
const ctx = cv.getContext('2d');
let show = {c: true, e: true, f: true};
document.addEventListener('keypress', ev => {
  if (ev.key in show) show[ev.key] = !show[ev.key];
});
let last = performance.now(), frames = 0;
function draw(dets) {
  ctx.drawImage(v, 0, 0, cv.width, cv.height);
  ctx.lineWidth = 2;
  for (const d of dets) {
    const f = d.face;
    if (show.c) { ctx.strokeStyle = 'red';
      ctx.strokeRect(f.x || 0, f.y || 0, f.size, f.size); }
    if (show.e) for (const e of (d.eyes || [])) {
      ctx.fillStyle = 'red';
      ctx.beginPath(); ctx.arc(e.x, e.y, 3, 0, 7); ctx.fill(); }
    if (show.f) for (const p of (d.landmark_points || [])) {
      ctx.fillStyle = 'aqua';
      ctx.beginPath(); ctx.arc(p.x, p.y, 2, 0, 7); ctx.fill(); }
  }
  frames++;
  const now = performance.now();
  if (now - last > 1000) {
    document.getElementById('fps').textContent = (frames * 1000 / (now - last)).toFixed(1);
    frames = 0; last = now;
  }
}
// Two engines share the draw path:
//  * server: POST frames to /detect, DEPTH requests pipelined in flight so
//    network+device round trips of consecutive frames overlap.
//  * client: the pure-JS PICO engine (pico.js) detects in-page with no
//    server round trip — the reference WASM surface and its config
//    (MinSize 200, MaxSize 480, shift 0.1, scale 1.1, IoU 0.1, q>50;
//    wasm/detector/detector.go:149-172, canvas.go:196).
const CLIENT = new URLSearchParams(location.search).get('engine') === 'client';
document.getElementById('engine').textContent =
  CLIENT ? 'engine: client (pico.js)' : 'engine: server';
let models = null;
function toJson(r) {
  const d = {face: {x: r.face.col - (r.face.scale >> 1),
                    y: r.face.row - (r.face.scale >> 1), size: r.face.scale}};
  if (r.eyes.length) d.eyes = r.eyes.map(e =>
    ({x: e.col, y: e.row, size: Math.trunc(e.scale)}));
  if (r.landmarks.length) d.landmark_points = r.landmarks.map(p =>
    ({x: p.col, y: p.row, size: Math.trunc(p.scale)}));
  return d;
}
function pumpClient() {
  ctx.drawImage(v, 0, 0, cv.width, cv.height);
  const id = ctx.getImageData(0, 0, cv.width, cv.height);
  const gray = PicoTPU.grayscaleRec709(id.data, cv.width, cv.height);
  const res = PicoTPU.detectAll(models, gray, cv.height, cv.width, {
    minSize: 200, maxSize: 480, shiftFactor: 0.1, scaleFactor: 1.1,
    iouThreshold: 0.1, qThresh: 50.0});
  draw(res.map(toJson));
  setTimeout(pumpClient, 0);
}
const DEPTH = 3;
let inflight = 0;
async function pump() {
  if (inflight >= DEPTH) return;
  inflight++;
  ctx.drawImage(v, 0, 0, cv.width, cv.height);
  const blob = await new Promise(r => cv.toBlob(r, 'image/jpeg', 0.7));
  try {
    const resp = await fetch('/detect', {method: 'POST', body: blob});
    draw(await resp.json());
  } finally {
    inflight--;
    setTimeout(pump, 0);
  }
}
function loop() { while (inflight < DEPTH) pump(); }
navigator.mediaDevices.getUserMedia({video: true}).then(async s => {
  v.srcObject = s;
  if (CLIENT) models = await PicoTPU.loadModels('');
  v.onloadedmetadata = () => CLIENT ? pumpClient() : loop();
}).catch(e => document.body.innerHTML += '<p>webcam unavailable: ' + e + '</p>');
</script></body></html>
"""


def results_to_json(results):
    """Reference JSON schema: x = column of the box corner, y = row."""
    out = []
    for res in results:
        r, c, s, _q = res["face"]
        d = {"face": {"x": c - s // 2, "y": r - s // 2, "size": s}}
        if res["eyes"]:
            d["eyes"] = [
                {"x": int(e[1]), "y": int(e[0]), "size": int(e[2])}
                for e in res["eyes"]
            ]
        if res["landmarks"]:
            d["landmark_points"] = [
                {"x": int(p[1]), "y": int(p[0]), "size": int(p[2])}
                for p in res["landmarks"]
            ]
        out.append(d)
    return out


def annotate(cv2, frame, results):
    for res in results:
        r, c, s = (int(v) for v in res["face"][:3])
        cv2.rectangle(frame, (c - s // 2, r - s // 2), (c + s // 2, r + s // 2),
                      (0, 0, 255), 2)
        for e in res["eyes"]:
            cv2.circle(frame, (int(e[1]), int(e[0])), 3, (0, 0, 255), -1)
        for p in res["landmarks"]:
            cv2.circle(frame, (int(p[1]), int(p[0])), 2, (255, 255, 0), -1)


STATIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")
REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def _sample_gray_packet() -> bytes:
    """sample.jpg's exact grayscale plane (u32 rows, u32 cols LE + pixels):
    gives the in-browser self-test a bit-identical frame (canvas JPEG
    decoders differ by +/-1 LSB from PIL, which would break golden parity)."""
    import struct

    from pigo_tpu.cascade.assets import asset_path
    from pigo_tpu.io.image import get_image, rgb_to_grayscale

    img = get_image(asset_path("testdata", "sample.jpg"))
    gray = rgb_to_grayscale(img)
    return struct.pack("<II", img.shape[0], img.shape[1]) + gray.tobytes()


def make_handler(engine, args, lock, stats, meter):
    import cv2

    from pigo_tpu.cascade.assets import asset_path

    gray_packet = _sample_gray_packet()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # request log like wasm/http/serve.go:45
            sys.stderr.write("%s - %s\n" % (self.address_string(), fmt % a))

        def _send_bytes(self, body: bytes, ctype: str):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_file(self, path: str, ctype: str):
            if not os.path.isfile(path):
                self.send_error(404)
                return
            with open(path, "rb") as fh:
                self._send_bytes(fh.read(), ctype)

        def do_GET(self):
            # Static client engine + cascade assets (the reference serves
            # /cascade/ the same way, wasm/http/serve.go:17-57).
            if self.path.startswith("/static/"):
                name = os.path.basename(self.path)
                ctype = ("text/javascript" if name.endswith(".js")
                         else "text/html")
                self._send_file(os.path.join(STATIC_DIR, name), ctype)
                return
            if self.path == "/selftest":
                self._send_file(os.path.join(STATIC_DIR, "selftest.html"),
                                "text/html")
                return
            if self.path.startswith("/cascade/"):
                parts = [p for p in self.path.split("/")[2:]
                         if p and p not in (".", "..")]
                self._send_file(asset_path("cascade", *parts),
                                "application/octet-stream")
                return
            if self.path == "/golden/sample.json":
                self._send_file(
                    os.path.join(REPO_ROOT, "tests", "golden", "sample.json"),
                    "application/json")
                return
            if self.path == "/testdata/sample.gray":
                self._send_bytes(gray_packet, "application/octet-stream")
                return
            if self.path == "/stats":
                payload = dict(stats.as_dict(), fps=round(meter.value, 1))
                body = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.split("?", 1)[0] == "/":
                body = PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/cam":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                cap = cv2.VideoCapture(
                    int(args.source) if args.source.isdigit() else args.source)
                try:
                    while True:
                        ok, frame = cap.read()
                        if not ok:
                            break
                        with lock:
                            results = engine.detect(
                                frame, min_size=args.min_size,
                                max_size=args.max_size, shift=args.shift,
                                scale=args.scale, iou=args.iou)
                        annotate(cv2, frame, results)
                        ok, jpg = cv2.imencode(".jpg", frame)
                        if not ok:
                            continue
                        self.wfile.write(b"--frame\r\n")
                        self.wfile.write(b"Content-Type: image/jpeg\r\n\r\n")
                        self.wfile.write(jpg.tobytes())
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass
                finally:
                    cap.release()
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/detect":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            buf = np.frombuffer(data, dtype=np.uint8)
            frame = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            if frame is None:
                self.send_error(400, "bad image")
                return
            with stats.stage("detect", items=1):
                if lock is None:  # stream engine: thread-safe queue
                    results = engine.detect(
                        frame, min_size=args.min_size, max_size=args.max_size,
                        shift=args.shift, scale=args.scale, iou=args.iou)
                else:
                    with lock:
                        results = engine.detect(
                            frame, min_size=args.min_size,
                            max_size=args.max_size, shift=args.shift,
                            scale=args.scale, iou=args.iou)
            meter.tick()
            body = json.dumps(results_to_json(results)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    from pigo_tpu.utils.profiling import FpsMeter, PipelineStats

    p = build_argparser(__doc__)
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--depth", type=int, default=4,
                   help="in-flight frames for the tpu-stream engine")
    for a in p._actions:  # extend the shared --engine choices
        if a.dest == "engine":
            a.choices = ("native", "tpu", "tpu-stream")
    args = p.parse_args()
    if args.engine == "tpu-stream":
        engine = make_engine(
            "tpu-stream", with_pupils=True, with_landmarks=True,
            depth=args.depth, min_size=args.min_size, max_size=args.max_size,
            shift=args.shift, scale=args.scale, iou=args.iou)
        lock = None  # queue-backed; concurrent requests pipeline on device
    else:
        engine = make_engine(args.engine, with_pupils=True,
                             with_landmarks=True)
        lock = threading.Lock()  # not re-entrant; serialize detects
    stats = PipelineStats()
    meter = FpsMeter()
    srv = ThreadingHTTPServer(("0.0.0.0", args.port),
                              make_handler(engine, args, lock, stats, meter))
    print(f"serving on http://localhost:{args.port}  (page: /, stream: /cam, "
          f"stats: /stats)", file=sys.stderr)
    srv.serve_forever()


if __name__ == "__main__":
    main()
