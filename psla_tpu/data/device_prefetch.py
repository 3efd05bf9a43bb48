"""Device-side input prefetch: overlap host->device transfer with compute.

The reference's input overlap ends at the host (torch DataLoader workers
produce CPU tensors; the H2D copy serializes with the training step,
src/traintest.py:81-84). Here a background thread stages the next batches'
device placement (``jax.device_put`` / ``make_array_from_process_local_data``
via the caller-supplied ``put``) while the current step executes, so the
PCIe/ICI ingest of batch k+1 rides under batch k's compute — the standard
double-buffering pattern (cf. flax.jax_utils.prefetch_to_device, which
this generalizes to dict batches with host-side metadata and mesh
shardings).

jax.device_put is thread-safe; the producer thread performs only device
placement (no collectives — make_array_from_process_local_data is
process-local), so multihost lockstep is unaffected: every host prefetches
its own shard at its own pace and the collectives still fire inside the
jitted steps in loader order.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


def prefetch_to_device(
    host_batches: Iterable[dict],
    put: Callable[[dict], dict],
    depth: int = 2,
) -> Iterator[tuple[dict, dict]]:
    """Yield ``(host_batch, device_batch)`` pairs in loader order.

    ``put`` maps a host batch (dict of numpy arrays) to its device form
    (e.g. ``lambda b: make_global_batch(b, mesh)``) and runs up to
    ``depth`` batches ahead on a daemon thread. The host batch is yielded
    alongside because the training loops read host-side metadata
    ('n_valid') that the device batch deliberately drops
    (parallel/mesh.drop_host_meta).

    ``depth <= 0`` degrades to the serial path (put inline, no thread).
    Producer exceptions re-raise in the consumer at the failing position.
    Abandoning the iterator (early break, error) unblocks and stops the
    producer via the same stop-event/drain handshake as data/loader.py.
    """
    if depth <= 0:
        for hb in host_batches:
            yield hb, put(hb)
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def enqueue(item) -> bool:
        # bounded put that notices an abandoned consumer (see
        # data/loader.py's producer for the pattern rationale)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for hb in host_batches:
                if stop.is_set():
                    return
                if not enqueue((hb, put(hb))):
                    return
            enqueue(None)
        except BaseException as e:  # re-raised at the consumer's position
            enqueue(e)

    t = threading.Thread(
        target=producer, daemon=True, name="psla-device-prefetch"
    )
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
