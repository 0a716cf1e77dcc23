"""ctypes bindings for the native C++ host engine (native/pigo_native.cpp).

The native library is the framework's counterpart of the reference's cgo
c-shared bridges (/root/reference/examples/*/[a-z]*.go) and unsafe cascade
deserialization. It serves three roles:

  1. host fallback engine — full PICO detection without a TPU,
  2. independent parity oracle for the JAX/Pallas kernels (a second
     implementation of the scalar semantics, tested against the NumPy oracle),
  3. the C ABI surface for non-Python consumers (the reference's FindFaces
     export shape: count header + flattened rows).

The shared object is built on demand with g++ (see native/Makefile) and
cached next to the source; set PIGO_NATIVE_THREADS to bound the scan pool.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "pigo_native.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libpigo_native.so")

_lib = None
_lib_lock = threading.Lock()

_CXXFLAGS = [
    "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared", "-pthread",
    "-ffp-contract=off", "-Wall",
]


class NativeUnavailable(RuntimeError):
    """Raised when the native engine cannot be built or loaded."""


def _build() -> str:
    if os.path.exists(_SO):
        try:
            if os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
                return _SO
        except OSError:
            # sources absent (installed package): use the prebuilt library
            return _SO
    if not os.path.exists(_SRC):
        raise NativeUnavailable(f"native sources missing: {_SRC}")
    cmd = ["g++", *_CXXFLAGS, "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (OSError, subprocess.CalledProcessError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        raise NativeUnavailable(f"native build failed: {detail}") from e
    return _SO


def _bind(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.pigo_face_new.restype = ctypes.c_void_p
    lib.pigo_face_new.argtypes = [u8p, ctypes.c_int64, ctypes.c_char_p,
                                  ctypes.c_int64]
    lib.pigo_face_free.argtypes = [ctypes.c_void_p]
    lib.pigo_face_depth.restype = ctypes.c_int
    lib.pigo_face_depth.argtypes = [ctypes.c_void_p]
    lib.pigo_face_trees.restype = ctypes.c_int
    lib.pigo_face_trees.argtypes = [ctypes.c_void_p]
    lib.pigo_classify_region.restype = ctypes.c_float
    lib.pigo_classify_region.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
    ]
    lib.pigo_face_run.restype = ctypes.c_int64
    lib.pigo_face_run.argtypes = [
        ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, f64p, ctypes.c_int64,
    ]
    lib.pigo_face_run_scales.restype = ctypes.c_int64
    lib.pigo_face_run_scales.argtypes = [
        ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, f64p, ctypes.c_int64,
    ]
    lib.pigo_classify_batch.argtypes = [
        ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.pigo_face_run_band.restype = ctypes.c_int64
    lib.pigo_face_run_band.argtypes = [
        ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, f64p, ctypes.c_int64,
    ]
    lib.pigo_cluster.restype = ctypes.c_int64
    lib.pigo_cluster.argtypes = [f64p, ctypes.c_int64, ctypes.c_double, f64p,
                                 ctypes.c_int64]
    lib.pigo_find_faces.restype = ctypes.c_int64
    lib.pigo_find_faces.argtypes = [
        ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, i64p, ctypes.c_int64,
    ]
    lib.pigo_pupil_new.restype = ctypes.c_void_p
    lib.pigo_pupil_new.argtypes = [u8p, ctypes.c_int64, ctypes.c_char_p,
                                   ctypes.c_int64]
    lib.pigo_pupil_free.argtypes = [ctypes.c_void_p]
    lib.pigo_pupil_stages.restype = ctypes.c_int
    lib.pigo_pupil_stages.argtypes = [ctypes.c_void_p]
    lib.pigo_pupil_jitter.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_uint64, f32p,
    ]
    lib.pigo_pupil_run.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int64, u8p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int, f64p,
    ]
    lib.pigo_landmark_run.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_uint64, u8p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int, f64p,
    ]
    lib.pigo_grayscale.argtypes = [u8p, ctypes.c_int64, ctypes.c_int, u8p]
    lib.pigo_version.restype = ctypes.c_char_p


def load_library() -> ctypes.CDLL:
    """Build (if stale) and load the native engine. Thread-safe, cached.

    Raises NativeUnavailable on every failure mode (missing toolchain,
    missing sources, corrupt/incompatible shared object)."""
    global _lib
    with _lib_lock:
        if _lib is None:
            try:
                lib = ctypes.CDLL(_build())
                _bind(lib)
            except NativeUnavailable:
                raise
            except (OSError, AttributeError) as e:
                raise NativeUnavailable(f"native load failed: {e}") from e
            _lib = lib
        return _lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except NativeUnavailable:
        return False


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeFaceCascade:
    """Host CPU face detector over the same frozen cascade binaries.

    Mirrors pigo_tpu.models.face.FaceCascade's run_cascade/detect surface.
    """

    def __init__(self, data: bytes | None = None):
        self._lib = load_library()
        if data is None:
            from pigo_tpu.cascade.assets import asset_path
            with open(asset_path("cascade", "facefinder"), "rb") as fh:
                data = fh.read()
        buf = np.frombuffer(data, dtype=np.uint8)
        err = ctypes.create_string_buffer(256)
        self._h = self._lib.pigo_face_new(_u8ptr(buf), buf.size, err, 256)
        if not self._h:
            raise ValueError(err.value.decode() or "invalid face cascade")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.pigo_face_free(h)
            self._h = None

    @property
    def depth(self) -> int:
        return self._lib.pigo_face_depth(self._h)

    @property
    def num_trees(self) -> int:
        return self._lib.pigo_face_trees(self._h)

    def classify_region(self, row: int, col: int, scale: int,
                        pixels: np.ndarray, nrows: int, dim: int,
                        angle: float = 0.0) -> float:
        pix = np.ascontiguousarray(pixels, dtype=np.uint8).ravel()
        return float(self._lib.pigo_classify_region(
            self._h, row, col, scale, _u8ptr(pix), nrows, dim, angle))

    def run_cascade(self, pixels: np.ndarray, rows: int, cols: int,
                    dim: int | None = None, *, min_size: int = 20,
                    max_size: int = 1000, shift_factor: float = 0.1,
                    scale_factor: float = 1.1,
                    angle: float = 0.0) -> np.ndarray:
        dim = cols if dim is None else dim
        pix = np.ascontiguousarray(pixels, dtype=np.uint8).ravel()
        cap = 4096
        while True:
            out = np.empty((cap, 4), dtype=np.float64)
            n = self._lib.pigo_face_run(
                self._h, _u8ptr(pix), rows, cols, dim, min_size, max_size,
                shift_factor, scale_factor, angle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap)
            if n <= cap:
                return out[:n].copy()
            cap = int(n)

    def run_scales(self, pixels: np.ndarray, rows: int, cols: int,
                   scales: np.ndarray, *, dim: int | None = None,
                   shift_factor: float = 0.1,
                   angle: float = 0.0) -> np.ndarray:
        """Scan an explicit scale list -> [N, 4] (row, col, scale, q)."""
        dim = cols if dim is None else dim
        pix = np.ascontiguousarray(pixels, dtype=np.uint8).ravel()
        sc = np.ascontiguousarray(scales, dtype=np.int32)
        cap = 4096
        while True:
            out = np.empty((cap, 4), dtype=np.float64)
            n = self._lib.pigo_face_run_scales(
                self._h, _u8ptr(pix), rows, cols, dim,
                sc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), sc.size,
                shift_factor, angle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap)
            if n <= cap:
                return out[:n].copy()
            cap = int(n)

    def classify_batch(self, pixels: np.ndarray, rows: int, dim: int,
                       windows: np.ndarray, angle: float = 0.0) -> np.ndarray:
        """Exact scores f32 [N] for windows int32 [N, 3] (row, col, scale)."""
        pix = np.ascontiguousarray(pixels, dtype=np.uint8).ravel()
        w = np.ascontiguousarray(windows, dtype=np.int32).reshape(-1, 3)
        out = np.empty(w.shape[0], dtype=np.float32)
        self._lib.pigo_classify_batch(
            self._h, _u8ptr(pix), rows, dim,
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), w.shape[0],
            angle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def run_band(self, pixels: np.ndarray, rows: int, cols: int,
                 bands: np.ndarray, *, dim: int | None = None,
                 shift_factor: float = 0.1,
                 angle: float = 0.0) -> np.ndarray:
        """Scan border bands: int32 [B, 5] rows (scale, r_lo, r_hi, c_lo,
        c_hi) — each scale's full grid excluding the inclusive interior
        window rectangle. -> [N, 4] (row, col, scale, q)."""
        dim = cols if dim is None else dim
        pix = np.ascontiguousarray(pixels, dtype=np.uint8).ravel()
        bd = np.ascontiguousarray(bands, dtype=np.int32).reshape(-1, 5)
        cap = 4096
        while True:
            out = np.empty((cap, 4), dtype=np.float64)
            n = self._lib.pigo_face_run_band(
                self._h, _u8ptr(pix), rows, cols, dim,
                bd.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                bd.shape[0], shift_factor, angle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap)
            if n <= cap:
                return out[:n].copy()
            cap = int(n)

    def detect(self, pixels: np.ndarray, rows: int, cols: int,
               dim: int | None = None, *, iou_threshold: float = 0.2,
               **kw) -> np.ndarray:
        dets = self.run_cascade(pixels, rows, cols, dim, **kw)
        return native_cluster(dets, iou_threshold)

    def find_faces(self, pixels: np.ndarray, rows: int, cols: int, *,
                   min_size: int = 20, max_size: int = 1000,
                   shift_factor: float = 0.1, scale_factor: float = 1.1,
                   angle: float = 0.0, iou_threshold: float = 0.2,
                   q_thresh: float = 5.0) -> np.ndarray:
        """cgo-bridge-shaped one-call pipeline -> int64 [N, 3] (row, col, scale)."""
        pix = np.ascontiguousarray(pixels, dtype=np.uint8).ravel()
        faces = 1024
        while True:
            cap = 1 + 3 * faces
            out = np.zeros(cap, dtype=np.int64)
            n = int(self._lib.pigo_find_faces(
                self._h, _u8ptr(pix), rows, cols, min_size, max_size,
                shift_factor, scale_factor, angle, iou_threshold, q_thresh,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap))
            if n <= faces:
                return out[1:1 + 3 * n].reshape(n, 3).copy()
            faces = n


class NativePupilLocalizer:
    """Host CPU pupil/landmark localizer (regression forest ensemble)."""

    def __init__(self, data: bytes | None = None):
        self._lib = load_library()
        if data is None:
            from pigo_tpu.cascade.assets import asset_path
            with open(asset_path("cascade", "puploc"), "rb") as fh:
                data = fh.read()
        buf = np.frombuffer(data, dtype=np.uint8)
        err = ctypes.create_string_buffer(256)
        self._h = self._lib.pigo_pupil_new(_u8ptr(buf), buf.size, err, 256)
        if not self._h:
            raise ValueError(err.value.decode() or "invalid pupil cascade")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.pigo_pupil_free(h)
            self._h = None

    @property
    def stages(self) -> int:
        return self._lib.pigo_pupil_stages(self._h)

    def jitter(self, row: float, col: float, scale: float, perturbs: int,
               seed: int = 0) -> np.ndarray:
        starts = np.empty((perturbs, 3), dtype=np.float32)
        self._lib.pigo_pupil_jitter(
            row, col, scale, perturbs, seed,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return starts

    def run_detector(self, starts: np.ndarray, pixels: np.ndarray,
                     nrows: int, ncols: int, dim: int | None = None, *,
                     angle: float = 0.0,
                     flip_v: bool = False) -> tuple[int, int, float]:
        """Ensemble walk + median vote from explicit [P, 3] start triples."""
        dim = ncols if dim is None else dim
        starts = np.ascontiguousarray(starts, dtype=np.float32)
        pix = np.ascontiguousarray(pixels, dtype=np.uint8).ravel()
        out3 = np.zeros(3, dtype=np.float64)
        self._lib.pigo_pupil_run(
            self._h,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            starts.shape[0], _u8ptr(pix), nrows, ncols, dim, angle,
            1 if flip_v else 0,
            out3.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return int(out3[0]), int(out3[1]), float(out3[2])

    def landmark(self, left: tuple[float, float], right: tuple[float, float],
                 pixels: np.ndarray, nrows: int, ncols: int,
                 dim: int | None = None, *, perturbs: int = 63,
                 seed: int = 0, angle: float = 0.0,
                 flip_v: bool = False) -> tuple[int, int, float]:
        """Landmark anchor geometry from the two pupils + ensemble vote."""
        dim = ncols if dim is None else dim
        pix = np.ascontiguousarray(pixels, dtype=np.uint8).ravel()
        out3 = np.zeros(3, dtype=np.float64)
        self._lib.pigo_landmark_run(
            self._h, left[0], left[1], right[0], right[1], perturbs, seed,
            _u8ptr(pix), nrows, ncols, dim, angle, 1 if flip_v else 0,
            out3.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return int(out3[0]), int(out3[1]), float(out3[2])


def native_cluster(dets: np.ndarray, iou_threshold: float) -> np.ndarray:
    """IoU clustering on host (reference core/pigo.go:262-308 semantics)."""
    lib = load_library()
    d = np.ascontiguousarray(dets, dtype=np.float64).reshape(-1, 4)
    out = np.empty_like(d)
    m = lib.pigo_cluster(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), d.shape[0],
        iou_threshold, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        d.shape[0])
    return out[:m].copy()


def native_grayscale(img: np.ndarray) -> np.ndarray:
    """Exact reference grayscale conversion -> flat uint8 [H*W]."""
    lib = load_library()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        return img.ravel().copy()
    channels = img.shape[-1]
    npix = img.size // channels
    out = np.empty(npix, dtype=np.uint8)
    lib.pigo_grayscale(_u8ptr(img.reshape(-1)), npix, channels, _u8ptr(out))
    return out
