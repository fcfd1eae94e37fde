"""Streaming tests — ports of test_savgol_stream.c: lifecycle, latency and
readiness gating (:71-97), conservation (:99-138, :277-304), streaming ==
batch golden cross-check (:140-189), derivative on ramp (:191-224),
reset/reuse (:226-248), flush clamping (:250-275)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg
from savgol_tpu import stream as fs

F64 = jnp.float64


def make(n=6, m=3, d=0, dt=1.0, dtype=F64):
    cfg = sg.SavgolConfig(n, m, d, dt)
    return sg.SavgolStream(cfg, dtype=dtype)


class TestLifecycle:
    def test_initial_state(self):
        s = make(5, 2)
        assert not s.ready
        assert s.latency == 5
        assert s.buffered == 0
        assert s.samples_received == 0
        assert s.samples_output == 0

    def test_init_from_existing_filter(self):
        # savgol_stream_init with non-owning filter ref
        # (src/savgol_stream.c:108-120)
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F64)
        s = sg.SavgolStream(f, dtype=F64)
        assert s.filter is f

    def test_bad_input_type(self):
        with pytest.raises(TypeError):
            sg.SavgolStream(42)


class TestLatencyAndGating:
    def test_no_output_until_full(self):
        # test_savgol_stream.c:71-97
        n = 5
        s = make(n, 2)
        ws = 2 * n + 1
        for i in range(ws - 1):
            _, valid = s.push(float(i))
            assert not valid
            assert not s.ready
        _, valid = s.push(float(ws - 1))
        assert valid
        assert s.ready
        assert s.buffered == ws

    def test_latency_is_half_window(self):
        for n in (1, 4, 12, 32):
            s = make(n, 1)
            assert s.latency == n


class TestConservation:
    @pytest.mark.parametrize("T", [13, 40, 100])
    def test_outputs_equal_inputs(self, T):
        # test_savgol_stream.c:277-304 — push_full + flush emits exactly T
        n = 6
        s = make(n, 3)
        total = 0
        rng = np.random.default_rng(0)
        for v in rng.standard_normal(T):
            total += len(s.push_full(float(v)))
        total += len(s.flush())
        assert total == T
        assert s.samples_output == T
        assert s.samples_received == T


class TestGoldenCrossCheck:
    def test_streaming_equals_batch_noisy_sine(self):
        # test_savgol_stream.c:140-189 (tolerance 1e-5 in the C; exact here)
        n, m = 6, 3
        rng = np.random.default_rng(99)
        t = np.linspace(0, 4 * np.pi, 200)
        x = np.sin(t) + 0.1 * rng.standard_normal(200)
        s = make(n, m)
        outs = []
        for v in x:
            outs.extend(s.push_full(float(v)).tolist())
        outs.extend(s.flush().tolist())
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=F64)
        batch = np.asarray(f.apply(jnp.asarray(x, dtype=F64)))
        np.testing.assert_allclose(np.array(outs), batch, atol=1e-9)

    @pytest.mark.parametrize("n,m,d", [(3, 2, 0), (6, 3, 1), (8, 4, 2),
                                       (1, 1, 0), (12, 4, 0)])
    def test_scan_stream_apply_equals_batch(self, n, m, d):
        rng = np.random.default_rng(7)
        x = rng.standard_normal(150)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F64)
        ys = np.asarray(sg.stream_apply(
            jnp.asarray(x, dtype=F64), f.center_weights, f.edge_weights,
            half_window=n, dt_inv=f.dt_inv, derivative=d))
        yb = np.asarray(f.apply(jnp.asarray(x, dtype=F64)))
        np.testing.assert_allclose(ys, yb, atol=1e-10)

    def test_stream_matches_reference_c_stream(self, ref):
        """Our push path vs the C batch path with reference edge sign:
        the C's own golden test guarantees stream == batch, so checking our
        stream against the C batch (compat sign) closes the loop."""
        n, m, d = 5, 3, 1
        rng = np.random.default_rng(3)
        x = rng.standard_normal(120).astype(np.float32)
        theirs = ref.apply(x, n, m, d)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F64)
        ys = np.asarray(sg.stream_apply(
            jnp.asarray(x, dtype=F64), f.center_weights, f.edge_weights,
            half_window=n, dt_inv=f.dt_inv, derivative=d,
            reference_edge_sign=True))
        assert np.abs(ys - theirs).max() <= 1e-5


class TestDerivativeOnRamp:
    def test_derivative_stream(self):
        # test_savgol_stream.c:191-224 — steady-state outputs equal slope
        s = make(5, 2, d=1)
        slope = 2.5
        vals = []
        for i in range(60):
            v, ok = s.push(slope * i)
            if ok:
                vals.append(v)
        assert len(vals) == 60 - 10
        np.testing.assert_allclose(vals, slope, atol=1e-8)

    def test_push_full_derivative_edges_correct_sign(self):
        """With the corrected leading-edge sign, a d=1 stream on a ramp
        emits +slope everywhere (the raw C emits -slope for the first n)."""
        s = make(5, 2, d=1)
        outs = []
        for i in range(40):
            outs.extend(s.push_full(3.0 * i).tolist())
        outs.extend(s.flush().tolist())
        np.testing.assert_allclose(outs, 3.0, atol=1e-8)


class TestResetReuse:
    def test_reset(self):
        # test_savgol_stream.c:226-248
        s = make(4, 2)
        for i in range(20):
            s.push(float(i))
        assert s.ready
        s.reset()
        assert not s.ready
        assert s.buffered == 0
        assert s.samples_received == 0
        # reusable after reset
        run1 = [s.push(float(i))[0] for i in range(20)][9:]
        s.reset()
        run2 = [s.push(float(i))[0] for i in range(20)][9:]
        np.testing.assert_allclose(run1, run2, atol=0)


class TestFlushSemantics:
    def test_flush_before_full_returns_nothing(self):
        s = make(5, 2)
        for i in range(5):
            s.push_full(float(i))
        assert len(s.flush()) == 0

    def test_flush_max_count_clamp(self):
        # test_savgol_stream.c:250-275
        n = 6
        s = make(n, 3)
        for i in range(30):
            s.push_full(float(i))
        out = s.flush(max_count=3)
        assert len(out) == 3

    def test_flush_full_count(self):
        n = 6
        s = make(n, 3)
        for i in range(30):
            s.push_full(float(i))
        assert len(s.flush()) == n

    def test_flush_leading(self):
        n = 4
        s = make(n, 2)
        for i in range(20):
            s.push_full(float(i))
        out = s.flush_leading()
        assert len(out) == n


class TestFunctionalAPI:
    def test_push_under_jit_scan(self):
        """The functional core composes with scan (carry = StreamState)."""
        import jax

        f = sg.Savgol1D.create(sg.SavgolConfig(3, 2), dtype=F64)
        x = jnp.asarray(np.arange(50.0), dtype=F64)

        def step(state, v):
            state, val, ok = fs.stream_push(state, v, f.center_weights,
                                            f.dt_inv)
            return state, (val, ok)

        state0 = fs.stream_init(3, dtype=F64)
        _, (vals, oks) = jax.lax.scan(step, state0, x)
        got = np.asarray(vals)[np.asarray(oks)]
        # steady-state linear data -> identity with latency n
        np.testing.assert_allclose(got, np.arange(3.0, 50.0 - 3.0),
                                   atol=1e-9)

    def test_state_is_pytree(self):
        import jax

        st = fs.stream_init(4)
        leaves = jax.tree_util.tree_leaves(st)
        assert len(leaves) == 4


class TestChunkedStreaming:
    """Chunked streaming: vectorized push_full-equivalent emission."""

    @pytest.mark.parametrize("n,m,T,C", [(6, 3, 200, 32), (5, 2, 101, 17),
                                         (12, 4, 500, 128), (3, 2, 25, 7),
                                         (1, 1, 10, 3), (32, 6, 300, 70),
                                         (6, 3, 100, 5), (12, 4, 80, 3),
                                         (6, 3, 40, 1)])
    def test_matches_batch(self, n, m, T, C):
        rng = np.random.default_rng(0)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=F64)
        x = rng.standard_normal(T)
        st = fs.chunk_init(n, dtype=F64)
        outs = []
        for i in range(0, T, C):
            ch = jnp.asarray(x[i:i + C], dtype=F64)
            st, o, c = fs.stream_process_chunk(
                st, ch, f.center_weights, f.edge_weights, f.dt_inv)
            outs.extend(np.asarray(o)[:int(c)].tolist())
        st, o, c = fs.stream_flush_chunked(st, f.edge_weights, f.dt_inv)
        outs.extend(np.asarray(o)[:int(c)].tolist())
        assert len(outs) == T, "conservation"
        want = np.asarray(f.apply(jnp.asarray(x, dtype=F64)))
        np.testing.assert_allclose(np.array(outs), want, atol=1e-10)

    def test_matches_push_full_emission_schedule(self):
        """Chunked and per-sample paths emit identical prefixes after every
        chunk boundary (not just at the end)."""
        n, m, C = 4, 2, 5
        rng = np.random.default_rng(1)
        x = rng.standard_normal(37)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=F64)
        st_c = fs.chunk_init(n, dtype=F64)
        st_p = fs.stream_init(n, dtype=F64)
        got_c, got_p = [], []
        for i in range(0, 35, C):
            ch = jnp.asarray(x[i:i + C], dtype=F64)
            st_c, o, cnt = fs.stream_process_chunk(
                st_c, ch, f.center_weights, f.edge_weights, f.dt_inv)
            got_c.extend(np.asarray(o)[:int(cnt)].tolist())
            for v in x[i:i + C]:
                st_p, o2, c2 = fs.stream_push_full(
                    st_p, v, f.center_weights, f.edge_weights, f.dt_inv)
                got_p.extend(np.asarray(o2)[:int(c2)].tolist())
            np.testing.assert_allclose(np.array(got_c), np.array(got_p),
                                       atol=1e-10)
            assert int(st_c.samples_output) == int(st_p.samples_output)

    def test_under_scan(self):
        """Chunked state is a pytree: whole pipelines scan over chunks."""
        n, m, C = 6, 3, 25
        rng = np.random.default_rng(2)
        x = rng.standard_normal(500)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=F64)
        chunks = jnp.asarray(x.reshape(-1, C), dtype=F64)

        def body(st, ch):
            st, o, c = fs.stream_process_chunk(
                st, ch, f.center_weights, f.edge_weights, f.dt_inv)
            return st, (o, c)

        st, (os_, cs) = jax.lax.scan(body, fs.chunk_init(n, dtype=F64),
                                     chunks)
        outs = []
        for o, c in zip(np.asarray(os_), np.asarray(cs)):
            outs.extend(o[:int(c)].tolist())
        st, o, c = fs.stream_flush_chunked(st, f.edge_weights, f.dt_inv)
        outs.extend(np.asarray(o)[:int(c)].tolist())
        want = np.asarray(f.apply(jnp.asarray(x, dtype=F64)))
        np.testing.assert_allclose(np.array(outs), want, atol=1e-10)

    def test_derivative_lead_sign(self):
        n, m = 5, 2
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, 1), dtype=F64)
        x = 3.0 * np.arange(40)
        st = fs.chunk_init(n, dtype=F64)
        outs = []
        for i in range(0, 40, 8):
            st, o, c = fs.stream_process_chunk(
                st, jnp.asarray(x[i:i + 8], dtype=F64), f.center_weights,
                f.edge_weights, f.dt_inv, lead_sign=-1.0)
            outs.extend(np.asarray(o)[:int(c)].tolist())
        st, o, c = fs.stream_flush_chunked(st, f.edge_weights, f.dt_inv)
        outs.extend(np.asarray(o)[:int(c)].tolist())
        np.testing.assert_allclose(outs, 3.0, atol=1e-9)


class TestModelChunked:
    def test_process_chunked_generator(self):
        rng = np.random.default_rng(9)
        x = rng.standard_normal(130)
        s = make(5, 3)
        outs = np.concatenate(list(s.process_chunked(
            [x[i:i + 40] for i in range(0, 130, 40)])))
        f = sg.Savgol1D.create(sg.SavgolConfig(5, 3), dtype=F64)
        np.testing.assert_allclose(
            outs, np.asarray(f.apply(jnp.asarray(x, dtype=F64))),
            atol=1e-9)


class TestReferenceStreamDifferential:
    @pytest.mark.parametrize("n,m,d", [(1, 1, 0), (5, 3, 0), (6, 3, 1),
                                       (12, 4, 2), (32, 10, 0)])
    def test_push_full_flush_vs_reference_stream(self, ref, n, m, d):
        """Differential test against the reference's OWN streaming API
        (savgol_stream_push_full + savgol_stream_flush), not just its batch
        path — with reference edge sign for bit-level protocol parity."""
        rng = np.random.default_rng(n * 100 + m)
        x = rng.standard_normal(120).astype(np.float32)
        theirs = ref.stream_run(x, n, m, d)
        st = fs.stream_init(n, dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F64)
        ours = []
        for v in x:
            st, o, c = fs.stream_push_full(
                st, float(v), f.center_weights, f.edge_weights, f.dt_inv,
                lead_sign=1.0)   # reference convention
            ours.extend(np.asarray(o)[:int(c)].tolist())
        st, o, c = fs.stream_flush(st, f.center_weights, f.edge_weights,
                                   f.dt_inv)
        ours.extend(np.asarray(o)[:int(c)].tolist())
        assert len(ours) == len(theirs) == x.size
        scale = max(1.0, np.abs(theirs).max())
        assert np.abs(np.array(ours) - theirs).max() <= 2e-5 * scale

    @pytest.mark.parametrize("max_outputs", [1, 2, 4])
    def test_push_full_clamp_vs_reference(self, ref, max_outputs):
        """Port of the reference clamp protocol for push_full
        (src/savgol_stream.c:208-218): with max_outputs < n+1 the
        fill-completing push delivers only the first max_outputs values,
        the rest are DROPPED, and samples_output counts delivered samples
        (test_savgol_stream.c:250-275 analog for push_full)."""
        n, m = 5, 3
        rng = np.random.default_rng(42)
        x = rng.standard_normal(30).astype(np.float32)
        theirs, their_counter = ref.stream_run_clamped(
            x, n, m, max_outputs=max_outputs, flush_max=3)
        s = make(n, m)
        ours = []
        for v in x:
            ours.extend(s.push_full(float(v), max_outputs=max_outputs)
                        .tolist())
        ours.extend(s.flush(max_count=3).tolist())
        assert len(ours) == len(theirs)
        assert s.samples_output == their_counter == len(ours)
        scale = max(1.0, np.abs(theirs).max())
        assert np.abs(np.array(ours) - theirs).max() <= 2e-5 * scale

    @pytest.mark.parametrize("bad", [0, -1, -7])
    def test_push_full_nonpositive_clamp_emits_nothing(self, bad):
        """max_outputs <= 0 emits NOTHING and leaves samples_output at 0
        (the C returns 0 for max_outputs <= 0, src/savgol_stream.c:183) —
        a negative bound must not drive the counters negative."""
        n = 4
        s = make(n, 2)
        for v in range(3 * n):
            out = s.push_full(float(v), max_outputs=bad)
            assert out.size == 0
        assert s.samples_output == 0
        assert s.flush(max_count=bad).size == 0
        assert s.samples_output == 0

    def test_push_full_clamp_counter_counts_delivered(self):
        """samples_output must equal delivered samples under clamping —
        the round-2 over-count bug (core emitted n+1, shell clamped)."""
        n = 6
        s = make(n, 3)
        delivered = 0
        for i in range(2 * n + 5):
            delivered += s.push_full(float(i), max_outputs=2).size
        assert s.samples_output == delivered
        # fill-completing push (#2n+1) clamped from n+1 to 2, then one
        # center per remaining push: (2n+5) - (2n+1) = 4 steady pushes
        assert delivered == 2 + 4

    def test_chunked_vs_reference_stream(self, ref):
        n, m = 8, 3
        rng = np.random.default_rng(7)
        x = rng.standard_normal(143).astype(np.float32)
        theirs = ref.stream_run(x, n, m)
        st = fs.chunk_init(n, dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=F64)
        ours = []
        for i in range(0, x.size, 17):
            st, o, c = fs.stream_process_chunk(
                st, jnp.asarray(x[i:i + 17], dtype=F64),
                f.center_weights, f.edge_weights, f.dt_inv)
            ours.extend(np.asarray(o)[:int(c)].tolist())
        st, o, c = fs.stream_flush_chunked(st, f.edge_weights, f.dt_inv)
        ours.extend(np.asarray(o)[:int(c)].tolist())
        assert len(ours) == x.size
        assert np.abs(np.array(ours) - theirs).max() <= 1e-5


def test_stream_apply_rejects_batched_input():
    import savgol_tpu as sg
    f = sg.Savgol1D.create(sg.SavgolConfig(4, 2))
    with pytest.raises(ValueError, match="ONE sequence"):
        sg.stream_apply(jnp.zeros((3, 100)), f.center_weights,
                        f.edge_weights, half_window=4)


@pytest.mark.parametrize("d", [0, 1])
def test_stream_apply_vmaps_over_batches(d):
    """The rejection message above promises "vmap it for batches" — hold
    that promise: vmapped stream_apply == batch apply row-for-row."""
    n, m = 6, 3
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, 130)), dtype=F64)
    f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F64)

    def one(row):
        return sg.stream_apply(row, f.center_weights, f.edge_weights,
                               half_window=n, dt_inv=f.dt_inv, derivative=d)

    ys = np.asarray(jax.jit(jax.vmap(one))(x))
    yb = np.asarray(f.apply(x))
    np.testing.assert_allclose(ys, yb, atol=1e-10)
