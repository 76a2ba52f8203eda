"""Cross-process safety of the _staged build lock (ADVICE r3): concurrent
processes sharing one staging dir must run build() exactly once, and no
process may observe a half-built dir. Pure-filesystem test — no JVM."""

import multiprocessing as mp
import os
import time


def _worker(base: str, results) -> None:
    import sys

    sys.path.insert(0, "/root/repo")
    from mit_spark.queries import _staged

    def build():
        # slow, multi-step build: a torn read would see step1 without DONE
        with open(os.path.join(base, "step1"), "w") as fh:
            fh.write("x")
        time.sleep(0.4)
        with open(os.path.join(base, "DONE"), "w") as fh:
            fh.write("y")
        with open(os.path.join(base, "build_count"), "a") as fh:
            fh.write("+")

    _staged(base, build)
    # every process, builder or waiter, must see the COMPLETE dir here
    ok = (
        os.path.exists(os.path.join(base, "step1"))
        and os.path.exists(os.path.join(base, "DONE"))
        and os.path.exists(os.path.join(base, "_STAGED"))
    )
    results.put(ok)


def test_staged_builds_once_across_processes(tmp_path):
    base = str(tmp_path / "stage_race")
    ctx = mp.get_context("spawn")
    results = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(base, results)) for _ in range(6)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0
    assert all(results.get(timeout=5) for _ in procs)
    with open(os.path.join(base, "build_count")) as fh:
        assert fh.read() == "+", "build() ran more than once"


def test_staged_recovers_from_crashed_build(tmp_path):
    """A dir with partial state but no marker (crashed builder) is wiped and
    rebuilt by the next caller."""
    import sys

    sys.path.insert(0, "/root/repo")
    from mit_spark.queries import _staged

    base = str(tmp_path / "stage_crash")
    os.makedirs(base)
    with open(os.path.join(base, "stale"), "w") as fh:
        fh.write("left by a crashed build")

    def build():
        with open(os.path.join(base, "fresh"), "w") as fh:
            fh.write("ok")

    _staged(base, build)
    assert not os.path.exists(os.path.join(base, "stale"))
    assert os.path.exists(os.path.join(base, "fresh"))
    # second call is a no-op (marker fast path)
    _staged(base, lambda: (_ for _ in ()).throw(AssertionError("rebuilt")))
