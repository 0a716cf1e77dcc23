/* pico.js — client-side PICO detection engine (faces, pupils, landmarks).
 *
 * The browser-native counterpart of the reference's WASM engine
 * (/root/reference/wasm/detector/detector.go, wasm/canvas/canvas.go): the
 * full pixel-intensity-comparison cascade family runs in the page with no
 * server round trip. Pure JS (no toolchain); bit-exact with the framework's
 * NumPy oracle and C++ engine for the deterministic face path — float32
 * arithmetic is emulated with Math.fround, integer fixed-point with 32-bit
 * ops — and statistically equivalent for the pupil/landmark ensembles
 * (the reference jitters them with a global RNG; see PicoTPU.xorshift for a
 * seeded one).
 *
 * Semantics references (behavioral, per the framework's SURVEY.md):
 *   face classify      core/pigo.go:113-147 (8.8 fixed point, bintest <=,
 *                      soft-cascade early exit)
 *   rotated classify   core/pigo.go:150-191 (33-entry quantized sin/cos,
 *                      16.16 fixed point, nrows-1 clamp on both axes)
 *   scan driver        core/pigo.go:212-258 (scale/step/offset formulas)
 *   clustering         core/pigo.go:262-308 (ascending-Q union averaging)
 *   pupil walk         core/puploc.go:106-154 (bintest >, per-axis clamps)
 *   rotated pupil walk core/puploc.go:157-217 (bintest <= — reference quirk)
 *   perturbation vote  core/puploc.go:239-277 (median at round(P/2))
 *   landmark anchors   core/flploc.go:36-56
 *   wasm surface       wasm/detector/detector.go:33-190 (configs, 15-slot
 *                      landmark schedule), wasm/canvas/canvas.go:179-191
 *                      (Rec.709 grayscale)
 */
"use strict";

const PicoTPU = (() => {
  const fr = Math.fround;

  // 256-scaled quantized cos/sin, indexed by trunc(32*angle), angle in
  // [0, 1] as a fraction of 2*pi (core/pigo.go:156-157).
  const QCOS = [256, 251, 236, 212, 181, 142, 97, 49, 0, -49, -97, -142,
    -181, -212, -236, -251, -256, -251, -236, -212, -181, -142, -97, -49,
    0, 49, 97, 142, 181, 212, 236, 251, 256];
  const QSIN = [0, 49, 97, 142, 181, 212, 236, 251, 256, 251, 236, 212,
    181, 142, 97, 49, 0, -49, -97, -142, -181, -212, -236, -251, -256,
    -251, -236, -212, -181, -142, -97, -49, 0];

  // ---------------------------------------------------------- deserializers

  // Face cascade binary: 8-byte header, u32 depth, u32 ntrees, then per
  // tree 4*2^d-4 int8 codes + 2^d f32 leaf preds + f32 threshold. Node 0
  // is a zero pad so node n's codes live at 4*n (core/pigo.go:51-110).
  function unpackFaceCascade(buffer) {
    const dv = new DataView(buffer);
    const depth = dv.getUint32(8, true);
    const ntrees = dv.getUint32(12, true);
    if (depth < 1 || depth > 16 || ntrees < 1 || ntrees > 1000000) {
      throw new Error(`invalid face cascade header: depth=${depth} trees=${ntrees}`);
    }
    const leaves = 1 << depth;
    const codeBytes = 4 * leaves - 4;
    const codes = new Int8Array(ntrees * leaves * 4); // node 0 zeroed
    const preds = new Float32Array(ntrees * leaves);
    const thresh = new Float32Array(ntrees);
    let off = 16;
    const raw = new Int8Array(buffer);
    for (let t = 0; t < ntrees; t++) {
      codes.set(raw.subarray(off, off + codeBytes), t * leaves * 4 + 4);
      off += codeBytes;
      for (let l = 0; l < leaves; l++, off += 4) {
        preds[t * leaves + l] = dv.getFloat32(off, true);
      }
      thresh[t] = dv.getFloat32(off, true);
      off += 4;
    }
    return { depth, ntrees, leaves, codes, preds, thresh };
  }

  // Pupil/landmark cascade binary: u32 stages, f32 scaleMult, u32 trees,
  // u32 depth, then per (stage, tree) 4*2^d-4 int8 codes + 2^d pairs of
  // f32 (dr, dc). Node n's codes live at 4*n, n in [0, 2^d-1)
  // (core/puploc.go:38-103).
  function unpackPupilCascade(buffer) {
    const dv = new DataView(buffer);
    const stages = dv.getUint32(0, true);
    const scaleMult = dv.getFloat32(4, true);
    const trees = dv.getUint32(8, true);
    const depth = dv.getUint32(12, true);
    if (stages < 1 || stages > 64 || trees < 1 || trees > 4096 ||
        depth < 1 || depth > 16) {
      throw new Error(`invalid pupil cascade header: stages=${stages} trees=${trees} depth=${depth}`);
    }
    const leaves = 1 << depth;
    const codeBytes = 4 * leaves - 4;
    const total = stages * trees;
    const codes = new Int8Array(total * leaves * 4); // last node zero pad
    const preds = new Float32Array(total * leaves * 2);
    let off = 16;
    const raw = new Int8Array(buffer);
    for (let t = 0; t < total; t++) {
      codes.set(raw.subarray(off, off + codeBytes), t * leaves * 4);
      off += codeBytes;
      for (let l = 0; l < 2 * leaves; l++, off += 4) {
        preds[t * leaves * 2 + l] = dv.getFloat32(off, true);
      }
    }
    return { stages, scaleMult, trees, depth, leaves, codes, preds };
  }

  // ------------------------------------------------------- face classifiers

  // Upright window classifier (core/pigo.go:113-147). Returns the f32
  // score, or -1 on soft-cascade early exit.
  function classifyRegion(cas, pixels, dim, r, c, s) {
    const { ntrees, leaves, codes, preds, thresh } = cas;
    const r256 = r * 256, c256 = c * 256;
    let out = 0;
    for (let t = 0; t < ntrees; t++) {
      const base = t * leaves * 4;
      let idx = 1;
      for (let d = 0; d < cas.depth; d++) {
        const o = base + idx * 4;
        const x1 = ((r256 + codes[o] * s) >> 8) * dim + ((c256 + codes[o + 1] * s) >> 8);
        const x2 = ((r256 + codes[o + 2] * s) >> 8) * dim + ((c256 + codes[o + 3] * s) >> 8);
        idx = 2 * idx + (pixels[x1] <= pixels[x2] ? 1 : 0);
      }
      out = fr(out + preds[t * leaves + idx - leaves]);
      if (out <= thresh[t]) return -1.0;
    }
    return fr(out - thresh[ntrees - 1]);
  }

  // Rotated window classifier (core/pigo.go:150-191). Preserves the
  // reference quirks: BOTH axes clamp with nrows-1, max(0,.) before the
  // >>16 shift, abs() after.
  function classifyRotatedRegion(cas, pixels, dim, nrows, r, c, s, angle) {
    const { ntrees, leaves, codes, preds, thresh } = cas;
    const qsin = s * QSIN[Math.trunc(32.0 * angle)];
    const qcos = s * QCOS[Math.trunc(32.0 * angle)];
    const r65536 = r * 65536, c65536 = c * 65536;
    const hi = nrows - 1;
    let out = 0;
    for (let t = 0; t < ntrees; t++) {
      const base = t * leaves * 4;
      let idx = 1;
      for (let d = 0; d < cas.depth; d++) {
        const o = base + idx * 4;
        const n0 = codes[o], n1 = codes[o + 1], n2 = codes[o + 2], n3 = codes[o + 3];
        const r1 = Math.abs(Math.min(hi, Math.max(0, r65536 + qcos * n0 - qsin * n1) >> 16));
        const c1 = Math.abs(Math.min(hi, Math.max(0, c65536 + qsin * n0 + qcos * n1) >> 16));
        const r2 = Math.abs(Math.min(hi, Math.max(0, r65536 + qcos * n2 - qsin * n3) >> 16));
        const c2 = Math.abs(Math.min(hi, Math.max(0, c65536 + qsin * n2 + qcos * n3) >> 16));
        idx = 2 * idx + (pixels[r1 * dim + c1] <= pixels[r2 * dim + c2] ? 1 : 0);
      }
      out = fr(out + preds[t * leaves + idx - leaves]);
      if (out <= thresh[t]) return -1.0;
    }
    return fr(out - thresh[ntrees - 1]);
  }

  // Multi-scale sliding-window scan (core/pigo.go:212-258). Returns
  // detections [{row, col, scale, q}] in reference scan order.
  function runCascade(cas, pixels, nrows, ncols, dim, params) {
    const minSize = params.minSize, maxSize = params.maxSize;
    const shift = params.shiftFactor, factor = params.scaleFactor;
    let angle = params.angle || 0.0;
    if (angle > 1.0) angle = 1.0;
    const dets = [];
    for (let scale = minSize; scale <= maxSize;
         scale = Math.trunc(scale + Math.max(2.0, scale * factor - scale))) {
      const step = Math.trunc(Math.max(shift * scale, 1.0));
      const offset = (scale >> 1) + 1;
      for (let row = offset; row <= nrows - offset; row += step) {
        for (let col = offset; col <= ncols - offset; col += step) {
          const q = angle > 0.0
            ? classifyRotatedRegion(cas, pixels, dim, nrows, row, col, scale, angle)
            : classifyRegion(cas, pixels, dim, row, col, scale);
          if (q > 0.0) dets.push({ row, col, scale, q });
        }
      }
    }
    return dets;
  }

  // Ascending-Q union clustering (core/pigo.go:262-308): every detection
  // with IoU > threshold joins the cluster (including already-clustered
  // ones); centers average with integer division, scores sum in f32.
  function clusterDetections(dets, iouThreshold) {
    const d = dets.slice().sort((a, b) => a.q - b.q);
    const n = d.length;
    const iou = (a, b) => {
      const overRow = Math.max(0,
        Math.min(a.row + a.scale / 2, b.row + b.scale / 2) -
        Math.max(a.row - a.scale / 2, b.row - b.scale / 2));
      const overCol = Math.max(0,
        Math.min(a.col + a.scale / 2, b.col + b.scale / 2) -
        Math.max(a.col - a.scale / 2, b.col - b.scale / 2));
      const inter = overRow * overCol;
      return inter / (a.scale * a.scale + b.scale * b.scale - inter);
    };
    const assigned = new Array(n).fill(false);
    const clusters = [];
    for (let i = 0; i < n; i++) {
      if (assigned[i]) continue;
      let sr = 0, sc = 0, ss = 0, sq = 0, nn = 0;
      for (let j = 0; j < n; j++) {
        if (iou(d[i], d[j]) > iouThreshold) {
          assigned[j] = true;
          sr += d[j].row; sc += d[j].col; ss += d[j].scale;
          sq = fr(sq + fr(d[j].q));
          nn++;
        }
      }
      if (nn > 0) {
        clusters.push({
          row: Math.trunc(sr / nn), col: Math.trunc(sc / nn),
          scale: Math.trunc(ss / nn), q: sq,
        });
      }
    }
    return clusters;
  }

  // -------------------------------------------------- pupil regression walk

  // One perturbation's staged walk (core/puploc.go:106-217). All float
  // arithmetic is f32 (Math.fround) to track the reference bit-for-bit
  // given identical starts. flipV mirrors column codes and dc.
  function pupilWalk(forest, pixels, nrows, ncols, dim, r, c, s, angle, flipV) {
    const { stages, scaleMult, trees, depth, leaves, codes, preds } = forest;
    const sign = flipV ? -1 : 1;
    const rotated = angle > 0.0;
    const tbl = rotated ? Math.trunc(32.0 * Math.min(angle, 1.0)) : 0;
    for (let i = 0; i < stages; i++) {
      let dr = 0, dc = 0;
      // upright: 8.8 fixed point on int(r), round-away(s)
      const ri = 256 * Math.trunc(r), ci = 256 * Math.trunc(c);
      const si = Math.round(s); // s > 0: half-away == Math.round
      // rotated: 16.16 fixed point, int(f32(s * table)) truncation
      const qsin = Math.trunc(fr(s * QSIN[tbl]));
      const qcos = Math.trunc(fr(s * QCOS[tbl]));
      const ri16 = 65536 * Math.trunc(r), ci16 = 65536 * Math.trunc(c);
      for (let j = 0; j < trees; j++) {
        const base = (i * trees + j) * leaves * 4;
        let idx = 0;
        for (let d = 0; d < depth; d++) {
          const o = base + idx * 4;
          const n0 = codes[o], n1 = sign * codes[o + 1];
          const n2 = codes[o + 2], n3 = sign * codes[o + 3];
          let b;
          if (rotated) {
            // bintest polarity <= here (reference quirk, puploc.go:193-199)
            const r1 = Math.min(nrows - 1, Math.max(0, ri16 + qcos * n0 - qsin * n1) >> 16);
            const c1 = Math.min(ncols - 1, Math.max(0, ci16 + qsin * n0 + qcos * n1) >> 16);
            const r2 = Math.min(nrows - 1, Math.max(0, ri16 + qcos * n2 - qsin * n3) >> 16);
            const c2 = Math.min(ncols - 1, Math.max(0, ci16 + qsin * n2 + qcos * n3) >> 16);
            b = pixels[r1 * dim + c1] <= pixels[r2 * dim + c2] ? 1 : 0;
          } else {
            const r1 = Math.min(nrows - 1, Math.max(0, (ri + n0 * si) >> 8));
            const c1 = Math.min(ncols - 1, Math.max(0, (ci + n1 * si) >> 8));
            const r2 = Math.min(nrows - 1, Math.max(0, (ri + n2 * si) >> 8));
            const c2 = Math.min(ncols - 1, Math.max(0, (ci + n3 * si) >> 8));
            b = pixels[r1 * dim + c1] > pixels[r2 * dim + c2] ? 1 : 0;
          }
          idx = 2 * idx + 1 + b;
        }
        const leaf = idx - (leaves - 1);
        dr = fr(dr + preds[((i * trees + j) * leaves + leaf) * 2]);
        dc = fr(dc + sign * preds[((i * trees + j) * leaves + leaf) * 2 + 1]);
      }
      r = fr(r + fr(dr * s));
      c = fr(c + fr(dc * s));
      s = fr(s * fr(scaleMult));
    }
    return [r, c, s];
  }

  // Perturbation ensemble + per-axis median vote (core/puploc.go:239-277).
  // rand() supplies uniforms in [0, 1) — Math.random by default, a seeded
  // xorshift for reproducible runs.
  function runDetector(forest, pixels, nrows, ncols, dim, start, perturbs,
                       angle, flipV, rand) {
    rand = rand || Math.random;
    const rows = [], cols = [], scales = [];
    const row0 = fr(start.row), col0 = fr(start.col), s0 = fr(start.scale);
    for (let p = 0; p < perturbs; p++) {
      // jitter (core/puploc.go:248-250), f32 ops
      const rj = fr(row0 + fr(fr(s0 * fr(0.15)) * fr(fr(0.5) - fr(rand()))));
      const cj = fr(col0 + fr(fr(s0 * fr(0.15)) * fr(fr(0.5) - fr(rand()))));
      const sj = fr(s0 * fr(fr(0.925) + fr(fr(0.15) * fr(rand()))));
      const [r, c, s] = pupilWalk(forest, pixels, nrows, ncols, dim,
                                  rj, cj, sj, angle, flipV);
      rows.push(r); cols.push(c); scales.push(s);
    }
    const asc = (a, b) => a - b;
    rows.sort(asc); cols.sort(asc); scales.sort(asc);
    const mid = Math.min(Math.round(perturbs / 2), perturbs - 1);
    return { row: Math.trunc(rows[mid]), col: Math.trunc(cols[mid]),
             scale: scales[mid] };
  }

  // Landmark anchor geometry from the two pupils (core/flploc.go:36-56).
  function getLandmarkPoint(flpc, leftEye, rightEye, pixels, nrows, ncols,
                            dim, perturbs, flipV, rand) {
    const dr = leftEye.row - rightEye.row, dc = leftEye.col - rightEye.col;
    const dist = Math.sqrt(dr * dr + dc * dc);
    const row = Math.trunc((leftEye.row + rightEye.row) / 2 + 0.25 * dist);
    const col = Math.trunc((leftEye.col + rightEye.col) / 2 + 0.15 * dist);
    return runDetector(flpc, pixels, nrows, ncols, dim,
                       { row, col, scale: 3.0 * dist },
                       perturbs, 0.0, flipV, rand);
  }

  // --------------------------------------------------------- image helpers

  // Reference WASM grayscale (wasm/canvas/canvas.go:179-191): Rec.709
  // luma, math.Round. Input: canvas RGBA bytes.
  function grayscaleRec709(rgba, width, height) {
    const gray = new Uint8Array(width * height);
    for (let i = 0, j = 0; i < gray.length; i++, j += 4) {
      gray[i] = Math.round(
        0.2126 * rgba[j] + 0.7152 * rgba[j + 1] + 0.0722 * rgba[j + 2]);
    }
    return gray;
  }

  // Library grayscale (core/grayscale.go:8-23): Rec.601 over 16-bit
  // channels, truncated — matches the framework's rgb_to_grayscale for
  // opaque pixels (used by the self-test for golden parity).
  function grayscaleRec601(rgba, width, height) {
    const gray = new Uint8Array(width * height);
    for (let i = 0, j = 0; i < gray.length; i++, j += 4) {
      gray[i] = Math.trunc(
        (0.299 * (rgba[j] * 257) + 0.587 * (rgba[j + 1] * 257) +
         0.114 * (rgba[j + 2] * 257)) / 256);
    }
    return gray;
  }

  // Seeded xorshift128+ uniforms in [0, 1) for reproducible ensembles.
  function xorshift(seed) {
    let s0 = seed >>> 0 || 0x9e3779b9, s1 = (seed * 0x85ebca6b) >>> 0 || 0xdeadbeef;
    return () => {
      let x = s0, y = s1;
      s0 = y;
      x ^= x << 23; x >>>= 0;
      s1 = (x ^ y ^ (x >>> 17) ^ (y >>> 26)) >>> 0;
      return ((s1 + y) >>> 0) / 4294967296;
    };
  }

  // --------------------------------------------------------- full pipeline

  // The reference WASM landmark schedule: 5 eye cascades x {upright,
  // flipped} + 4 mouth cascades + lp84 flipped = 15 slots
  // (wasm/detector/detector.go:110-145).
  const EYE_CASCADES = ["lp46", "lp44", "lp42", "lp38", "lp312"];
  const MOUTH_CASCADES = ["lp93", "lp84", "lp82", "lp81"];

  // One-call face -> pupils -> landmarks pipeline over a grayscale frame,
  // mirroring the WASM surface (detector.go:68-145: pupil anchors
  // 0.085/0.185, scale*0.4, q-gate on the caller).
  function detectAll(models, pixels, nrows, ncols, params) {
    const dim = params.dim || ncols;
    const perturbs = params.perturbs || 63;
    const qThresh = params.qThresh === undefined ? 50.0 : params.qThresh;
    const rand = params.rand;
    const dets = runCascade(models.face, pixels, nrows, ncols, dim, params);
    const faces = clusterDetections(dets, params.iouThreshold || 0.1);
    const out = [];
    for (const f of faces) {
      const rec = { face: f, eyes: [], landmarks: [] };
      out.push(rec);
      if (f.q <= qThresh || !models.puploc) continue;
      const rowOff = Math.trunc(fr(fr(0.085) * fr(f.scale)));
      const colOff = Math.trunc(fr(fr(0.185) * fr(f.scale)));
      const eyeScale = fr(fr(f.scale) * fr(0.4));
      const left = runDetector(models.puploc, pixels, nrows, ncols, dim,
        { row: f.row - rowOff, col: f.col - colOff, scale: eyeScale },
        perturbs, params.angle || 0, false, rand);
      const right = runDetector(models.puploc, pixels, nrows, ncols, dim,
        { row: f.row - rowOff, col: f.col + colOff, scale: eyeScale },
        perturbs, params.angle || 0, false, rand);
      if (left.row > 0 && left.col > 0) rec.eyes.push(left);
      if (right.row > 0 && right.col > 0) rec.eyes.push(right);
      if (rec.eyes.length < 2 || !models.lps) continue;
      for (const name of EYE_CASCADES) {
        for (const flip of [false, true]) {
          const p = getLandmarkPoint(models.lps[name], left, right, pixels,
                                     nrows, ncols, dim, perturbs, flip, rand);
          if (p.row > 0 && p.col > 0) rec.landmarks.push(p);
        }
      }
      for (const name of MOUTH_CASCADES) {
        const p = getLandmarkPoint(models.lps[name], left, right, pixels,
                                   nrows, ncols, dim, perturbs, false, rand);
        if (p.row > 0 && p.col > 0) rec.landmarks.push(p);
      }
      const p84 = getLandmarkPoint(models.lps["lp84"], left, right, pixels,
                                   nrows, ncols, dim, perturbs, true, rand);
      if (p84.row > 0 && p84.col > 0) rec.landmarks.push(p84);
    }
    return out;
  }

  // Fetch + unpack all cascades from the server's /cascade/ routes
  // (reference wasm/detector/fetch.go:83-108 + detector.go:33-64).
  async function loadModels(base) {
    base = base || "";
    const fetchBuf = async (path) => {
      const resp = await fetch(base + path);
      if (!resp.ok) throw new Error(`fetch ${path}: ${resp.status}`);
      return resp.arrayBuffer();
    };
    const face = unpackFaceCascade(await fetchBuf("/cascade/facefinder"));
    const puploc = unpackPupilCascade(await fetchBuf("/cascade/puploc"));
    const lps = {};
    for (const name of EYE_CASCADES.concat(MOUTH_CASCADES)) {
      lps[name] = unpackPupilCascade(await fetchBuf("/cascade/lps/" + name));
    }
    return { face, puploc, lps };
  }

  return {
    unpackFaceCascade, unpackPupilCascade,
    classifyRegion, classifyRotatedRegion, runCascade, clusterDetections,
    pupilWalk, runDetector, getLandmarkPoint,
    grayscaleRec709, grayscaleRec601, xorshift,
    detectAll, loadModels,
    EYE_CASCADES, MOUTH_CASCADES,
  };
})();

if (typeof module !== "undefined" && module.exports) module.exports = PicoTPU;
