"""Shared flock acquire-with-timeout guard.

One implementation of the subtle choreography both the VersionedTable
manifest commit (`sinks/versioned.py`) and the dedup-ledger maintenance
window (`operators/dedup.py`) need, so a future fix (ENOLCK handling,
interruptible waits) lands in one place:

- ``flock``, never an O_EXCL lock-file protocol: the kernel releases a
  flock when the holder's fd closes — including on crash — so staleness
  detection (and every stale-break race) is unnecessary by construction.
- The lock file is NEVER unlinked: removing it would let a later opener
  lock the old inode while a newer opener locks a fresh one (the classic
  unlink race).
- LOCK_EX | LOCK_NB poll loop with a deadline; the caller supplies the
  timeout and the exception to raise, so each site keeps its own error
  type and message.
- Unlock before close, both in ``finally`` — close alone releases the
  lock, but the explicit unlock keeps the intent visible and survives a
  future switch to dup'd descriptors.

Scope: filesystems whose flock is real (local, NFSv4). Object stores
need a real commit protocol (Delta/Iceberg) — callers gate on that
themselves (see `_ledger_guard`'s URI check).
"""

from __future__ import annotations

import contextlib
import errno
import fcntl
import os
import time
from collections.abc import Callable


@contextlib.contextmanager
def flock_guard(
    lock_path: str,
    timeout_sec: float,
    make_error: Callable[[], Exception],
    poll_sec: float = 0.01,
):
    os.makedirs(os.path.dirname(lock_path) or ".", exist_ok=True)
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        deadline = time.time() + timeout_sec
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError as e:
                # Only "lock is busy" errnos are retryable. Filesystems
                # whose flock is unsupported (ENOTSUP/ENOLCK on some
                # FUSE/NFSv3 mounts) must fail IMMEDIATELY with the real
                # error — spinning the full timeout and then raising a
                # concurrency error would misdiagnose a broken mount as
                # contention.
                if e.errno not in (
                    errno.EWOULDBLOCK,
                    errno.EAGAIN,
                    errno.EINTR,
                ):
                    raise
                if time.time() > deadline:
                    raise make_error() from None
                time.sleep(poll_sec)
        yield
    finally:
        try:
            fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)
