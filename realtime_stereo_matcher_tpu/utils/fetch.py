"""Deadline-guarded device->host fetches for the relayed TPU runtime.

Round 4's v1 12k-step run wedged at its 8000-step checkpoint save: the
training process's TPU-relay client got stuck mid device->host fetch (a
fresh process could still reach the chip), and because ``jax.device_get``
blocks uninterruptibly, the whole run hung until the round deadline killed
it (BASELINE.md "Round-4 v1 12k-run incident").  The reference has no analog
of this failure (local CUDA fetches don't wedge) and no recovery machinery
of any kind (SURVEY.md §5 "Failure detection: none").

:func:`timed_fetch` runs a blocking fetch in a daemon worker thread with a
deadline.  On timeout it abandons the stuck thread (it parks on the wedged
RPC forever, costing one idle thread) and retries with a FRESH fetch — the
relay client multiplexes requests, so a new fetch can succeed while an old
one is stuck.  After ``retries`` timeouts it raises :class:`FetchTimeout`
so the CALLER decides the blast radius: the trainer skips a periodic
checkpoint save or drops a metrics batch and keeps training (train/
trainer.py) instead of wedging the run.
"""

from __future__ import annotations

import logging
import threading


class FetchTimeout(RuntimeError):
    """A device->host fetch exceeded its deadline on every attempt."""


def timed_fetch(fn, *, timeout: float, what: str = "device fetch",
                retries: int = 1):
    """Run ``fn()`` (a blocking device->host pull) under a deadline.

    Returns ``fn()``'s value.  Exceptions raised by ``fn`` propagate
    immediately (they are real errors, not wedges).  Each timeout logs a
    warning and retries with a fresh call; after ``retries`` extra attempts
    raises :class:`FetchTimeout`.

    ``timeout`` is per attempt, in seconds.
    """
    attempts = retries + 1
    for attempt in range(attempts):
        box: dict = {}
        done = threading.Event()

        def run():
            try:
                box["value"] = fn()
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                box["error"] = exc
            finally:
                done.set()

        worker = threading.Thread(
            target=run, daemon=True, name=f"timed-fetch({what})")
        worker.start()
        if done.wait(timeout):
            if "error" in box:
                raise box["error"]
            return box["value"]
        logging.warning(
            "%s exceeded %.0fs deadline (attempt %d/%d) — abandoning the "
            "stuck fetch thread and %s", what, timeout, attempt + 1,
            attempts, "retrying with a fresh fetch"
            if attempt + 1 < attempts else "giving up")
    raise FetchTimeout(
        f"{what} timed out after {attempts} attempt(s) of {timeout:.0f}s — "
        "the TPU-relay client is likely wedged mid device->host pull")
