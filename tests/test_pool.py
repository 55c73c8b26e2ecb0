"""Engine worker pool: thread reuse without starvation.

The reference spawns one OS thread per dispatched node
(`/root/reference/src/engine.rs:288-306`); the pool must keep that model's
no-starvation property (a blocked worker never prevents new dispatches —
nested Graph-node workers block awaiting sub-outputs) while reusing idle
threads between dispatches.
"""

import threading
import time

from kanter_core_tpu.engine import _WorkerPool


def test_pool_runs_tasks():
    pool = _WorkerPool("t")
    done = []
    lock = threading.Lock()
    ev = threading.Event()

    def task(i):
        with lock:
            done.append(i)
            if len(done) == 50:
                ev.set()

    for i in range(50):
        pool.submit(task, i)
    assert ev.wait(10)
    assert sorted(done) == list(range(50))


def test_pool_reuses_idle_workers():
    pool = _WorkerPool("t")
    names = set()
    lock = threading.Lock()

    def task(barrier):
        with lock:
            names.add(threading.current_thread().name)
        barrier.set()

    # sequential submits with the previous task finished: one thread serves all
    for _ in range(10):
        barrier = threading.Event()
        pool.submit(task, barrier)
        assert barrier.wait(5)
        time.sleep(0.01)  # let the worker re-enter its idle wait
    assert len(names) <= 2  # >1 only if a wait/submit race spawned an extra


def test_pool_no_starvation_under_blocked_workers():
    """Tasks submitted while every existing worker is blocked must still run
    (new workers spawn on demand — the nested-Graph-node deadlock guard)."""
    pool = _WorkerPool("t")
    release = threading.Event()
    unblocked = threading.Event()

    def blocker():
        release.wait(30)

    def prober():
        unblocked.set()

    for _ in range(8):
        pool.submit(blocker)
    time.sleep(0.05)
    pool.submit(prober)
    assert unblocked.wait(5), "submit queued behind blocked workers"
    release.set()
