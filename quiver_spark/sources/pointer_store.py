"""Generation-pointer storage seam for the quiver sink's atomic snapshots.

The sink's OVERWRITE commit is a two-step protocol: publish staged files
into a fresh ``gen-NNNNNN/`` directory, then swap the table's ``_current``
pointer to name it (see ``QuiverWriter._publish``). Both steps touch only
three storage primitives, which this module isolates behind
:class:`PointerStore` so a deployment can swap the POSIX implementation
for an object-store one (S3/GCS manifest object with conditional PUT /
generation preconditions) without touching the commit protocol itself:

* ``claim_generation`` — reserve a generation name exclusively, so two
  concurrent overwrites can never interleave files into one directory;
* ``swap_pointer``   — compare-and-swap the pointer, so a lost race is a
  loud :class:`ConcurrentWriteError`, never a silently mixed snapshot;
* ``lock``           — serialize whole publish sections of writers on the
  same table, which upgrades "loud failure" to "both writers succeed,
  last commit wins" where the store supports it.

The default :class:`LocalPointerStore` uses ``os.mkdir`` exclusive-create
for claims, write-temp + ``os.replace`` for the swap (atomic on POSIX),
and an advisory ``fcntl.flock`` on ``<table>/_writer.lock`` to serialize
writers. The reference format is a single-file library with an explicit
one-rowgroup misuse guard (``/root/reference/src/write/writer.rs:107-112``)
and no table/catalog layer at all — multi-writer coordination is engine
surface this repo adds, and the same refuse-don't-corrupt posture applies.

Concurrency contract (also stated on the sink): with the default local
store, concurrent writers against one table are serialized by the
advisory lock, so concurrent overwrites commit as two distinct
generations (last pointer swap wins) and an append never publishes into a
generation that an overwrite is concurrently garbage-collecting. On a
store whose ``lock`` is a no-op (object stores without one), generation
claims and append re-verification still detect their races loudly; the
pointer swap itself is check-then-replace here (see the ``swap_pointer``
docstring), so pointer-vs-pointer race detection is best-effort until an
object-store adapter overrides it with a true conditional PUT. In every
case the outcome is last-swap-wins with the superseded generation
retained — never a mixed or torn snapshot.
"""

from __future__ import annotations

import contextlib
import os


class ConcurrentWriteError(RuntimeError):
    """Another writer committed to this table concurrently; this commit was
    refused to avoid publishing a mixed or lost snapshot. The winner's
    snapshot is intact and live; re-running the failed write retries
    cleanly (Spark re-stages its tasks from source)."""


class PointerStore:
    """Storage primitives behind the generation pointer protocol.

    The base class implements the POSIX-correct default behavior; an
    object-store adapter overrides these four methods (and typically makes
    ``lock`` a no-op, leaning on ``claim_generation`` +
    ``swap_pointer``'s CAS for race detection)."""

    #: pointer file naming the live generation
    CURRENT = "_current"
    #: advisory writer lock file (hidden from scans by the `_` prefix)
    LOCKFILE = "_writer.lock"

    def read_pointer(self, table_path: str) -> str | None:
        """Current generation name, or None if the table has no pointer."""
        cur = os.path.join(table_path, self.CURRENT)
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return f.read().strip()

    def claim_generation(self, table_path: str, gen_name: str) -> bool:
        """Exclusively reserve ``gen_name`` for this writer. True if the
        claim succeeded, False if another writer already holds it (caller
        retries with the next number). Exclusive-create of the generation
        directory doubles as the claim token — the directory is invisible
        to readers until the pointer names it."""
        try:
            os.mkdir(os.path.join(table_path, gen_name))
            return True
        except FileExistsError:
            return False

    def swap_pointer(
        self, table_path: str, new_gen: str, expected: str | None
    ) -> None:
        """Compare-and-swap the pointer from ``expected`` to ``new_gen``.

        Raises :class:`ConcurrentWriteError` if the pointer no longer
        names ``expected`` (another writer committed since this writer
        planned), or if the post-swap read-back does not name ``new_gen``
        (a racing swap on a store without locking). Under the local
        store's ``lock`` neither can fire.

        LIMITATION — the base implementation is check-then-replace, not a
        true atomic CAS: on a no-op-lock store two swaps can interleave so
        that writer B reads the expected pointer before A's ``os.replace``
        lands and replaces after A's read-back, letting BOTH report
        success while A's snapshot is silently superseded (last replace
        wins; never a mixed or torn snapshot — A's generation stays
        retained and time-travelable). Race DETECTION on lock-less stores
        is therefore best-effort at this layer; a real object-store
        adapter MUST override ``swap_pointer`` with the store's native
        conditional PUT / generation-precondition primitive to make the
        CAS atomic. The bundled guarantees are: LocalPointerStore (lock
        held) — serialized, no race; UnlockedPointerStore — claim +
        append re-verification still detect their races loudly, and the
        pointer race above narrows to the replace/read-back window."""
        import uuid as _uuid

        current = self.read_pointer(table_path)
        if current != expected:
            raise ConcurrentWriteError(
                f"generation pointer of {table_path} moved from "
                f"{expected!r} to {current!r} during this overwrite — "
                "another writer committed concurrently; this snapshot was "
                "NOT published"
            )
        # per-swap unique temp name: a shared fixed name would let two
        # racing swaps on a lock-less store consume each other's temp file
        # (raw FileNotFoundError, possibly a torn pointer) instead of the
        # contractual ConcurrentWriteError below
        tmp = os.path.join(
            table_path, f"{self.CURRENT}.tmp.{_uuid.uuid4().hex}"
        )
        try:
            with open(tmp, "w") as f:
                f.write(new_gen)
            os.replace(tmp, os.path.join(table_path, self.CURRENT))
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        after = self.read_pointer(table_path)
        if after != new_gen:
            raise ConcurrentWriteError(
                f"generation pointer of {table_path} reads {after!r} "
                f"immediately after swapping to {new_gen!r} — a concurrent "
                "writer raced the swap; table state is their snapshot"
            )

    @contextlib.contextmanager
    def lock(self, table_path: str):
        """Exclusive advisory lock serializing publish sections of writers
        on one table. Held across stage-move + pointer swap + GC, so a
        reader-invisible partial publish can never be observed by a
        concurrent writer's GC. Local impl: ``fcntl.flock`` on
        ``<table>/_writer.lock`` (advisory — both writers must go through
        this sink; an out-of-band ``rm`` is not protected, same as every
        file-based table format)."""
        os.makedirs(table_path, exist_ok=True)
        import fcntl

        fd = os.open(
            os.path.join(table_path, self.LOCKFILE),
            os.O_CREAT | os.O_RDWR,
            0o644,
        )
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            try:
                fcntl.flock(fd, fcntl.LOCK_UN)
            finally:
                os.close(fd)


class LocalPointerStore(PointerStore):
    """POSIX filesystem store (the default). All behavior inherited."""


class UnlockedPointerStore(PointerStore):
    """A store whose ``lock`` is a no-op — models object stores with no
    locking primitive. Generation claims and append re-verification still
    detect their races and raise :class:`ConcurrentWriteError`; the
    inherited pointer swap is best-effort check-then-replace (see
    ``PointerStore.swap_pointer`` — last replace wins, superseded
    snapshots stay retained). Used by tests to pin the loud-failure
    paths, and a template for real S3/GCS adapters, which MUST override
    the pointer methods with conditional PUTs on a manifest object to
    make the swap a true CAS."""

    @contextlib.contextmanager
    def lock(self, table_path: str):
        os.makedirs(table_path, exist_ok=True)
        yield


#: process-wide active store; swap with :func:`set_pointer_store` to plug
#: in an object-store adapter (or a fault-injecting fake in tests)
_ACTIVE: PointerStore = LocalPointerStore()


def get_pointer_store() -> PointerStore:
    return _ACTIVE


def set_pointer_store(store: PointerStore) -> PointerStore:
    """Install ``store`` as the active pointer store; returns the previous
    one so callers (tests) can restore it."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = store
    return prev
