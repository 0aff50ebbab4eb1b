"""Infrastructure tests: distributions, optimizer, percentile, dates,
search, host pipeline queues."""

import threading
import time

import numpy as np
import pytest

from kgl_gene_tpu.parallel.host_pipeline import (
    MTStreamBuffer,
    QueueMonitor,
    QueueMtSafe,
    QueueTidal,
    WorkflowAsync,
    WorkflowPipeline,
    WorkflowThreads,
)
from kgl_gene_tpu.utils.date_time import DateGP
from kgl_gene_tpu.utils.distributions import (
    BinomialDistribution,
    DeterministicSource,
    GammaDistribution,
    HypergeometricDistribution,
    NormalDistribution,
    UniformRealDistribution,
)
from kgl_gene_tpu.utils.optimize import (
    OptimizationAlgorithm,
    OptimizationType,
    Optimize,
)
from kgl_gene_tpu.utils.percentile import Percentile
from kgl_gene_tpu.utils.search import search_view
from kgl_gene_tpu.utils.utility import process_mem_usage, process_time_usage, tokenize


class TestDistributions:
    def test_deterministic(self):
        a = UniformRealDistribution(1.0, 0.0)
        g1, g2 = DeterministicSource(5), DeterministicSource(5)
        assert a.random(g1.generator()) == a.random(g2.generator())

    def test_normal_moments(self):
        dist = NormalDistribution(2.0, 3.0)
        gen = DeterministicSource(1).generator()
        samples = [dist.random(gen) for _ in range(20000)]
        assert abs(np.mean(samples) - 2.0) < 0.1
        assert abs(np.std(samples) - 3.0) < 0.1
        assert abs(dist.cdf(2.0) - 0.5) < 1e-12

    def test_binomial_gamma(self):
        gen = DeterministicSource(2).generator()
        b = BinomialDistribution(10, 0.5)
        assert 0 <= b.random(gen) <= 10
        assert abs(b.pdf(5) - 0.24609375) < 1e-9
        g = GammaDistribution(2.0, 1.0)
        assert abs(g.cdf(100.0) - 1.0) < 1e-9

    def test_hypergeometric_enrichment(self):
        # 5 of 50 marked, draw 10: P(X >= 3)
        h = HypergeometricDistribution(K=5, n=10, N=50)
        total = sum(h.pdf(k) for k in range(0, 6))
        assert abs(total - 1.0) < 1e-9
        assert abs(h.upper_tail(0) - 1.0) < 1e-12
        assert h.upper_tail(3) < 0.1


class TestOptimize:
    def test_maximize_parabola(self):
        opt = Optimize(OptimizationAlgorithm.LN_NELDERMEAD, 1, OptimizationType.MAXIMIZE)
        opt.bounding_hypercube([10.0], [-10.0])
        coeffs = [5.0]
        code, value, evals = opt.optimize(coeffs, None, lambda x, d: -(x[0] - 3.0) ** 2)
        assert Optimize.return_success(code)
        assert abs(coeffs[0] - 3.0) < 1e-3
        assert abs(value) < 1e-5

    def test_minimize_2d(self):
        opt = Optimize(OptimizationAlgorithm.LD_LBFGS, 2)
        coeffs = [0.0, 0.0]
        code, value, _ = opt.optimize(
            coeffs, None, lambda x, d: (x[0] - 1) ** 2 + (x[1] + 2) ** 2
        )
        assert Optimize.return_success(code)
        assert abs(coeffs[0] - 1.0) < 1e-4 and abs(coeffs[1] + 2.0) < 1e-4


class TestPercentile:
    def test_basic(self):
        p = Percentile()
        for i in range(100):
            p.add_element(float(i), f"item{i}")
        value, payload = p.percentile(0.5)
        assert value == 50.0
        assert p.percentile(0.0)[0] == 0.0
        assert p.percentile(1.0)[0] == 99.0
        assert p.rank(49.5) == 0.5
        assert len(p.percentile_range(0.9, 1.0)) == 10


class TestDateGP:
    def test_parse_formats(self):
        assert DateGP("2020/1/1") == DateGP(2020, 1, 1)
        assert DateGP("2001-Feb-28") == DateGP(2001, 2, 28)
        assert DateGP("2020-Jan-01").text() == "2020-Jan-01"

    def test_arithmetic(self):
        a, b = DateGP(2020, 1, 1), DateGP(2020, 3, 1)
        assert DateGP.days_difference(a, b) == 60  # leap year
        assert DateGP.months_difference(a, b) == 2
        assert a < b
        assert DateGP().not_initialized()

    def test_invalid(self):
        with pytest.raises(ValueError):
            DateGP(2001, 2, 29)


class TestSearch:
    def test_motif_intervals(self):
        hits = search_view("ATG", "ATGxxATGyyATG")
        assert [(h.lower, h.upper) for h in hits] == [(0, 3), (5, 8), (10, 13)]

    def test_overlapping(self):
        hits = search_view("AA", "AAAA")
        assert len(hits) == 3

    def test_regex_class(self):
        hits = search_view("A[CT]G", "ACGATGAAG")
        assert [(h.lower, h.upper) for h in hits] == [(0, 3), (3, 6)]


class TestHostPipeline:
    def test_workflow_threads(self):
        pool = WorkflowThreads(4)
        futures = [pool.enqueue_future(lambda x: x * x, i) for i in range(10)]
        assert [f.result() for f in futures] == [i * i for i in range(10)]
        pool.shutdown()

    def test_tidal_queue_backpressure(self):
        q = QueueTidal(high_tide=10, low_tide=2)
        for i in range(10):
            q.push(i)
        assert q.flood_count == 1  # hit high tide

        popped = []

        def consumer():
            for _ in range(10):
                popped.append(q.wait_and_pop())

        t = threading.Thread(target=consumer)
        t.start()
        q.push(10)  # blocks until ebb, then succeeds
        t.join()
        assert q.wait_and_pop() == 10
        assert popped == list(range(10))

    def test_pipeline_preserves_order(self):
        import random

        def slow_square(x):
            time.sleep(random.random() * 0.005)
            return x * x

        pipe = WorkflowPipeline(slow_square, threads=4)
        results = list(pipe.map_iter(range(50)))
        assert results == [i * i for i in range(50)]
        pipe.close()

    def test_monitor_report(self):
        q = QueueMtSafe(name="test")
        mon = QueueMonitor(q, sample_ms=5, name="test")
        mon.launch_stats()
        for i in range(5):
            q.push(i)
            time.sleep(0.01)
        report = mon.stop_stats()
        assert report["samples"] > 0
        assert report["max_size"] >= 0


class TestUtility:
    def test_tokenize(self):
        assert tokenize("a\tb\tc", "\t") == ["a", "b", "c"]

    def test_process_probes(self):
        vm, rss = process_mem_usage()
        assert rss > 0
        sys_t, user_t = process_time_usage()
        assert user_t >= 0


class TestWorkflowAsync:
    STOP = "<stop>"

    def test_single_stage_processing(self):
        results = []
        lock = threading.Lock()

        def work(item):
            if item == self.STOP:
                return
            with lock:
                results.append(item * 2)

        wf = WorkflowAsync(self.STOP)
        assert wf.activate_workflow(4, work)
        assert not wf.activate_workflow(2, work)  # already active
        for i in range(100):
            wf.push(i)
        wf.stop()
        assert sorted(results) == [i * 2 for i in range(100)]

    def test_ganged_three_stage_chain(self):
        """Stop token cascades through ganged stages
        (kel_workflow_async.h:33: the last thread forwards the token via
        the workflow function)."""
        sink = []
        lock = threading.Lock()
        stage3 = WorkflowAsync(self.STOP)
        stage2 = WorkflowAsync(self.STOP)
        stage1 = WorkflowAsync(self.STOP)

        def final(item):
            if item == self.STOP:
                return
            with lock:
                sink.append(item)

        def forward(nxt, item):
            # Stage fn: transform and push downstream; the stop token
            # arrives here from the last thread and cascades.
            nxt.push(item if item == self.STOP else item + 1)

        stage3.activate_workflow(2, final)
        stage2.activate_workflow(3, forward, stage3)
        stage1.activate_workflow(4, forward, stage2)
        for i in range(50):
            stage1.push(i)
        stage1.stop()   # cascades: stage1 -> stage2 -> stage3
        stage2.join()
        stage3.join()
        assert sorted(sink) == [i + 2 for i in range(50)]

    def test_tidal_queue_backing(self):
        done = []
        wf = WorkflowAsync(-1, queue_obj=QueueTidal(high_tide=16, low_tide=4))
        wf.activate_workflow(2, lambda item: item == -1 or done.append(item))
        for i in range(64):
            wf.push(i)
        wf.stop()
        assert len(done) == 64


class TestMTStreamBuffer:
    def test_reads_all_lines(self, tmp_path):
        path = tmp_path / "lines.txt"
        lines = [f"line-{i}\n" for i in range(5000)]
        path.write_text("".join(lines))
        buf = MTStreamBuffer(open(path))
        got = list(buf)
        assert got == lines
        assert buf.read_line() is None  # post-EOF stays None
        buf.close()
