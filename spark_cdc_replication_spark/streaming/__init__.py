"""Structured-Streaming operators and artifact-store helpers."""

from __future__ import annotations


def finish_artifact_build(
    q, root: str, timeout_s: int = 300, what: str = "artifact"
) -> None:
    """Block until an ``availableNow`` artifact-build query terminates,
    guaranteeing the artifact root never outlives a failed build.

    Closes two teardown races in the build-once-serve-many stores
    (r11 ADVICE): ``StreamingQuery.stop()`` is asynchronous, so an
    immediate ``shutil.rmtree(root)`` could race in-flight stream
    writers — after ``stop()`` this re-awaits termination, BOUNDED by
    the same ``timeout_s`` (r12 ADVICE: an unbounded re-await could
    hang the helper forever if a stopped query's sink wedged; if even
    the bounded wait does not confirm termination we log, clean and
    raise anyway — surfacing the timeout beats blocking the caller);
    and a ``StreamingQueryException`` raised by ``awaitTermination``
    used to leave a half-built root on disk until the next rebuild's
    stale-sibling sweep — the exception path now cleans the root too
    before re-raising, so a later session can never mistake a
    half-built root for a committed artifact.
    """
    import shutil
    import warnings

    try:
        finished = q.awaitTermination(timeout_s)
    except Exception:
        # the query died mid-build (already terminated) — never leave
        # a half-built root behind; re-raise the streaming error
        shutil.rmtree(root, ignore_errors=True)
        raise
    if not finished:
        q.stop()  # asynchronous — do NOT rmtree until termination
        try:
            # prompt once stop() is requested, but never block forever
            if not q.awaitTermination(timeout_s):
                warnings.warn(
                    f"{what} build query did not confirm termination "
                    f"within {timeout_s}s of stop(); deleting {root} anyway",
                    RuntimeWarning,
                    stacklevel=2,
                )
        except Exception:
            pass  # the TimeoutError below is the error we surface
        shutil.rmtree(root, ignore_errors=True)
        raise TimeoutError(f"{what} build did not finish within {timeout_s}s")
