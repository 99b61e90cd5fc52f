"""tpe.fmin_parallel — the round-based multi-worker fmin driver behind
multi-process ComponentOptimizer searches.

The reference gets the same capability from hyperopt's parallel workers
(MongoTrials); its sequential `fmin` call (optimization.py:123-130) is the
n_workers=1 special case, which must reproduce `fmin` EXACTLY (same rng
consumption, same trial stream).  The multi-worker path is exercised here
in-process with threads in lockstep (a barrier-backed loss exchange), and
end-to-end with two real OS processes in tests/test_multiprocess.py.
"""

import threading

import numpy as np
import pytest

from alpine_tpu.optimize.tpe import (
    STATUS_FAIL,
    STATUS_OK,
    Trials,
    fmin,
    fmin_parallel,
    hp,
    tpe,
)

SPACE = {
    "x": hp.uniform("x", -4.0, 4.0),
    "y": hp.quniform("y", 2, 30, 1),
}


def _objective(point):
    # smooth bowl + a failure region (exercises STATUS_FAIL bookkeeping)
    if point["y"] > 28:
        return {"loss": np.inf, "status": STATUS_FAIL}
    loss = (point["x"] - 1.0) ** 2 + 0.1 * (point["y"] - 10) ** 2
    return {"loss": float(loss), "status": STATUS_OK,
            "params": {"x": point["x"], "y": point["y"]}}


def _remote(point, loss):
    if point["y"] > 28:
        return {"loss": np.inf, "status": STATUS_FAIL}
    return {"loss": loss, "status": STATUS_OK,
            "params": {"x": point["x"], "y": point["y"]}}


def test_single_worker_reduces_to_fmin_exactly():
    t_seq, t_par = Trials(), Trials()
    best_seq = fmin(_objective, SPACE, algo=tpe.suggest, max_evals=40,
                    trials=t_seq, rstate=np.random.default_rng(7))
    best_par = fmin_parallel(
        _objective, SPACE, fn_remote=_remote,
        exchange_losses=lambda v: np.asarray([v]),
        n_workers=1, worker_index=0, algo=tpe.suggest, max_evals=40,
        trials=t_par, rstate=np.random.default_rng(7),
    )
    assert best_seq == best_par
    assert len(t_seq.trials) == len(t_par.trials) == 40
    for a, b in zip(t_seq.trials, t_par.trials):
        assert a["tid"] == b["tid"]
        assert a["misc"]["vals"] == b["misc"]["vals"]
        assert a["result"]["loss"] == b["result"]["loss"]
        assert a["result"]["status"] == b["result"]["status"]


def _lockstep_workers(n_workers, max_evals, round_size=None, seed=3):
    """Run fmin_parallel on n_workers threads whose exchange_losses is a
    barrier-synchronized shared row — a faithful in-process model of the
    multi-process allgather."""
    barrier = threading.Barrier(n_workers)
    shared = np.full(n_workers, np.nan)
    eval_counts = [0] * n_workers
    trials = [Trials() for _ in range(n_workers)]
    results = [None] * n_workers
    errors = []

    def exchange(widx):
        def _ex(my_loss):
            shared[widx] = my_loss
            barrier.wait()          # everyone wrote
            row = shared.copy()
            barrier.wait()          # everyone read (safe to overwrite)
            return row
        return _ex

    def fn(widx):
        def _fn(point):
            eval_counts[widx] += 1
            return _objective(point)
        return _fn

    def run(widx):
        try:
            results[widx] = fmin_parallel(
                fn(widx), SPACE, fn_remote=_remote,
                exchange_losses=exchange(widx),
                n_workers=n_workers, worker_index=widx,
                algo=tpe.suggest, max_evals=max_evals,
                trials=trials[widx],
                rstate=np.random.default_rng(seed),
                round_size=round_size,
            )
        except BaseException as exc:  # surface thread failures in the test
            errors.append((widx, exc))
            barrier.abort()

    threads = [threading.Thread(target=run, args=(w,)) for w in range(n_workers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert not errors, errors
    return trials, results, eval_counts


def test_two_workers_identical_trials_and_split_evaluation():
    trials, results, counts = _lockstep_workers(n_workers=2, max_evals=30)
    assert results[0] == results[1]
    assert len(trials[0].trials) == len(trials[1].trials) == 30
    for a, b in zip(trials[0].trials, trials[1].trials):
        assert a["tid"] == b["tid"]
        assert a["misc"]["vals"] == b["misc"]["vals"]
        assert a["result"]["loss"] == b["result"]["loss"]
        assert a["result"]["status"] == b["result"]["status"]
        # remote reconstruction carries the params record too
        if a["result"]["status"] == STATUS_OK:
            assert a["result"]["params"] == b["result"]["params"]
    # the work was actually SPLIT: each worker evaluated only its round
    # indices (15 rounds of 2), not the whole stream
    assert counts[0] == counts[1] == 15
    # and the search still found the bowl
    ok = [t["result"]["loss"] for t in trials[0].trials
          if t["result"]["status"] == STATUS_OK]
    assert min(ok) < 2.0


def test_replicated_rounds_while_round_size_one():
    # round_size=1 until 10 trials exist (the max_iter-detection hook):
    # those trials must be evaluated by EVERY worker (replicated), the
    # rest split two ways.  The freeze flag is PER WORKER (each worker's
    # stream is deterministic, so both freeze at the same trial count;
    # threads only synchronize at exchanges, a shared flag would race).
    frozen = [False, False]

    barrier = threading.Barrier(2)
    shared = np.full(2, np.nan)
    counts = [0, 0]
    trials = [Trials(), Trials()]
    errors = []

    def run(widx):
        def _fn(point):
            counts[widx] += 1
            r = _objective(point)
            if len(trials[widx].trials) >= 9:  # freeze after 10 evals land
                frozen[widx] = True
            return r

        def _ex(my_loss):
            shared[widx] = my_loss
            barrier.wait()
            row = shared.copy()
            barrier.wait()
            return row

        try:
            fmin_parallel(
                _fn, SPACE, fn_remote=_remote, exchange_losses=_ex,
                n_workers=2, worker_index=widx, algo=tpe.suggest,
                max_evals=20, trials=trials[widx],
                rstate=np.random.default_rng(11),
                round_size=lambda: 2 if frozen[widx] else 1,
            )
        except BaseException as exc:
            errors.append((widx, exc))
            barrier.abort()

    threads = [threading.Thread(target=run, args=(w,)) for w in (0, 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert not errors, errors
    assert len(trials[0].trials) == len(trials[1].trials) == 20
    for a, b in zip(trials[0].trials, trials[1].trials):
        assert a["misc"]["vals"] == b["misc"]["vals"]
        assert a["result"]["loss"] == b["result"]["loss"]
    # 10 replicated + 5 rounds of 2 → 15 local evaluations each
    assert counts[0] == counts[1] == 15


def test_tail_round_exchanges_instead_of_replicating():
    # 21 evals on 2 workers: 10 rounds of 2, then a width-1 TAIL round that
    # must stay a parallel round (worker 0 evaluates, worker 1 adopts the
    # exchanged loss) — not a replicated round that burns n_workers
    # redundant fits and exposes the post-search digest to float drift
    trials, results, counts = _lockstep_workers(n_workers=2, max_evals=21)
    assert results[0] == results[1]
    assert len(trials[0].trials) == len(trials[1].trials) == 21
    for a, b in zip(trials[0].trials, trials[1].trials):
        assert a["misc"]["vals"] == b["misc"]["vals"]
        assert a["result"]["loss"] == b["result"]["loss"]
    assert counts == [11, 10], counts


def test_worker_exception_surfaces_on_every_worker():
    # worker 1's objective raises inside a parallel round: worker 1 must
    # re-raise its own error AFTER joining the exchange, and worker 0 must
    # get a RuntimeError naming the failed worker — neither may hang in
    # the (timeout-free) collective
    barrier = threading.Barrier(2)
    shared = np.full(2, np.nan)
    errors = {}

    def run(widx):
        def _fn(point):
            if widx == 1:
                raise ValueError("boom on worker 1")
            return _objective(point)

        def _ex(my_loss):
            shared[widx] = my_loss
            barrier.wait()
            row = shared.copy()
            barrier.wait()
            return row

        try:
            fmin_parallel(
                _fn, SPACE, fn_remote=_remote, exchange_losses=_ex,
                n_workers=2, worker_index=widx, algo=tpe.suggest,
                max_evals=10, trials=Trials(),
                rstate=np.random.default_rng(5),
            )
        except BaseException as exc:
            errors[widx] = exc
            return
        errors[widx] = None

    threads = [threading.Thread(target=run, args=(w,)) for w in (0, 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    assert not any(th.is_alive() for th in threads), "a worker hung"
    assert isinstance(errors[1], ValueError) and "boom" in str(errors[1])
    assert isinstance(errors[0], RuntimeError) and "worker(s) [1]" in str(errors[0])


def test_worker_exception_in_replicated_round_surfaces_everywhere():
    # worker 1's objective raises inside a REPLICATED (round_size=1)
    # round: without the ok/error flag exchange, worker 0 would append the
    # trial and advance into the next round's collective while worker 1 is
    # dead — the exact timeout-free hang the parallel protocol prevents
    barrier = threading.Barrier(2)
    shared = np.full(2, np.nan)
    errors = {}

    def run(widx):
        def _fn(point):
            if widx == 1:
                raise ValueError("boom in replicated round")
            return _objective(point)

        def _ex(my_loss):
            shared[widx] = my_loss
            barrier.wait()
            row = shared.copy()
            barrier.wait()
            return row

        try:
            fmin_parallel(
                _fn, SPACE, fn_remote=_remote, exchange_losses=_ex,
                n_workers=2, worker_index=widx, algo=tpe.suggest,
                max_evals=10, trials=Trials(),
                rstate=np.random.default_rng(5),
                round_size=lambda: 1,
            )
        except BaseException as exc:
            errors[widx] = exc
            return
        errors[widx] = None

    threads = [threading.Thread(target=run, args=(w,)) for w in (0, 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    assert not any(th.is_alive() for th in threads), "a worker hung"
    assert isinstance(errors[1], ValueError) and "boom" in str(errors[1])
    assert (isinstance(errors[0], RuntimeError)
            and "worker(s) [1]" in str(errors[0])
            and "replicated" in str(errors[0]))


def test_objective_dict_without_status_rejected_clearly():
    # hyperopt's contract: dict results must carry 'status'; float(dict)
    # previously raised an unrelated TypeError
    with pytest.raises(ValueError, match="status"):
        fmin(lambda point: {"loss": 1.2}, SPACE, algo=tpe.suggest,
             max_evals=1, trials=Trials(),
             rstate=np.random.default_rng(0))


def test_nan_loss_coerced_identically_on_wire_and_record():
    # a genuinely-NaN objective loss must not be mistaken for the error
    # sentinel, and every worker must append the SAME (inf) record
    def nan_objective(point):
        return {"loss": float("nan"), "status": STATUS_OK}

    barrier = threading.Barrier(2)
    shared = np.full(2, np.nan)
    trials = [Trials(), Trials()]
    errors = []

    def run(widx):
        def _ex(my_loss):
            shared[widx] = my_loss
            barrier.wait()
            row = shared.copy()
            barrier.wait()
            return row

        try:
            fmin_parallel(
                nan_objective, SPACE,
                fn_remote=lambda p, loss: {"loss": loss, "status": STATUS_OK},
                exchange_losses=_ex, n_workers=2, worker_index=widx,
                algo=tpe.suggest, max_evals=4, trials=trials[widx],
                rstate=np.random.default_rng(5),
            )
        except BaseException as exc:
            errors.append((widx, exc))
            barrier.abort()

    threads = [threading.Thread(target=run, args=(w,)) for w in (0, 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    assert not errors, errors
    for a, b in zip(trials[0].trials, trials[1].trials):
        assert a["result"]["loss"] == b["result"]["loss"] == float("inf")


def test_exchange_shape_validated():
    with pytest.raises(ValueError, match="exchange_losses"):
        fmin_parallel(
            _objective, SPACE, fn_remote=_remote,
            exchange_losses=lambda v: np.asarray([v, v, v]),
            n_workers=2, worker_index=0, algo=tpe.suggest, max_evals=4,
            trials=Trials(), rstate=np.random.default_rng(0),
        )
