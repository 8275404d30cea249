"""Host->device transfer-rate probe vs buffer size.

The axon tunnel was measured at ~14 MB/s for ~4 MB training batches
(BASELINE.md r1); the 2.8 GB device-view staging in
bench_system_decomp.py ran far slower, suggesting the effective rate
degrades with transfer size. This probe times jax.device_put across
sizes so the store can pick a chunking strategy on evidence.

Run on TPU:  python scripts/bench_transfer.py
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("backend:", dev.platform, file=sys.stderr)
    results = []
    # measured 2026-08 (warm-biased first pass): 13.8 / 27.5 / 25.1 /
    # 18.5 MB/s at 1/4/16/64 MB; a single 256 MB device_put ran at
    # <0.5 MB/s (aborting it wedged the tunnel for ~30+ min — see
    # CLAUDE.md). Large buffers stage in <=64 MB chunks
    # (data/device_store.py::_chunked_put).
    for mb in (1, 4, 16, 64, 128):
        arr = np.random.rand(mb * 1024 * 1024 // 4).astype(np.float32)
        # warm EVERY size once (put + the shape-specific x[:1] slice
        # compile), then time the second pass — otherwise the large
        # sizes carry first-dispatch/compile cost the small ones don't
        np.asarray(jax.device_put(arr)[:1])
        t0 = time.time()
        x = jax.device_put(arr)
        # force completion: a dependent host read of one element
        float(np.asarray(x[:1])[0])
        dt = time.time() - t0
        results.append({"mb": mb, "s": round(dt, 2),
                        "mb_per_s": round(mb / dt, 2)})
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
