"""Background device->host fetches.

`np.asarray` / `jax.device_get` release the GIL while they wait on device
compute and the D2H transfer, so a worker thread overlaps the fetch with
the caller's host work. On the dev tunnel every blocking fetch costs a
~25 ms round trip; threading it off the frame path is the difference
between a stalled frame and a free one.
"""
from __future__ import annotations

import threading
from typing import Optional


class BackgroundFetch:
    """Fetch a pytree of device arrays on a worker thread."""

    def __init__(self, arrays):
        self._val = None
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, args=(arrays,),
                                        daemon=False)
        self._thread.start()

    def _run(self, arrays):
        try:
            import jax

            self._val = jax.device_get(arrays)
        except BaseException as e:  # surfaced on get()
            self._err = e

    def done(self) -> bool:
        return not self._thread.is_alive()

    def get(self):
        self._thread.join()
        if self._err is not None:
            raise self._err
        return self._val
