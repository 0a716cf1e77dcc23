"""Worker process for the 2-process multi-host test (test_multiprocess.py).

Usage: python tests/_mp_worker.py <rank> <port>

Joins a 2-process CPU cluster over localhost (gloo DCN transport), runs the
window-sharded detection pass (production Pallas kernels + all_gather +
psum across the process boundary) on a deterministic multi-face frame, and
prints the detections as one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rank, port = int(sys.argv[1]), int(sys.argv[2])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pigo_tpu.parallel import init_distributed

    n = init_distributed(f"127.0.0.1:{port}", num_processes=2,
                         process_id=rank)
    assert n == 4, f"expected 4 global devices, got {n}"
    assert jax.process_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    from pigo_tpu.ops import face_pallas
    from pigo_tpu.parallel import ShardedFaceCascade, make_mesh

    # Barrier on a trivial psum BEFORE the real program: gloo's rendezvous
    # times out if the ranks reach their first collective >30s apart (their
    # import/compile phases interleave on one CPU core); this tiny program
    # compiles in seconds on both ranks and re-synchronizes them.
    mesh0 = make_mesh(4, "d")
    barrier = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, "d"), mesh=mesh0,
        in_specs=P("d"), out_specs=P(),
    ))
    np.asarray(barrier(jnp.ones(4, jnp.float32)))

    face_pallas.TAIL_MIN_WINDOWS = 512  # keep dense scales on the kernels

    frame = make_frame()
    rows, cols = frame.shape
    sharded = ShardedFaceCascade(make_mesh(4, "window"))
    dets = sharded.window_sharded_hits(
        frame, rows, cols, min_size=20, max_size=100, shift_factor=0.1,
        scale_factor=1.3,
    )
    print("DETS " + json.dumps(dets.tolist()), flush=True)
    return 0


def make_frame():
    """The same deterministic two-face frame as tests/test_parallel.py."""
    import numpy as np
    from PIL import Image

    from pigo_tpu.cascade.assets import asset_path
    from pigo_tpu.io.image import get_image, rgb_to_grayscale

    img = get_image(asset_path("testdata", "sample.jpg"))
    gray = rgb_to_grayscale(img).reshape(img.shape[0], img.shape[1])
    tiny = np.asarray(Image.fromarray(gray).resize((18, 22)), np.uint8)
    frame = np.full((96, 88), 200, np.uint8)
    for r0, c0 in ((12, 14), (58, 52)):
        frame[r0:r0 + 22, c0:c0 + 18] = tiny
    return frame


if __name__ == "__main__":
    sys.exit(main())
