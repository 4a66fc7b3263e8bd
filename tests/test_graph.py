"""Graph metrics (`ops/graph.py`) against brute-force numpy oracles and
known-structure graphs."""
import numpy as np
import pytest

from ninwavelets_tpu.ops import (char_path_length, clustering_onnela,
                                 global_efficiency, shortest_paths,
                                 small_worldness, strength)

RNG = np.random.default_rng(3)


def _rand_w(c=6, batch=()):
    w = RNG.random(batch + (c, c)).astype(np.float32)
    w = 0.5 * (w + np.swapaxes(w, -1, -2))
    idx = np.arange(c)
    w[..., idx, idx] = 0.0
    return w


def _floyd(w):
    c = w.shape[-1]
    d = np.where(w > 1e-12, 1.0 / np.maximum(w, 1e-12), np.inf)
    np.fill_diagonal(d, 0.0)
    for k in range(c):
        d = np.minimum(d, d[:, k:k + 1] + d[k:k + 1, :])
    return d


class TestGraph:
    def test_strength(self):
        w = _rand_w()
        np.testing.assert_allclose(np.asarray(strength(w)), w.sum(-1),
                                   rtol=1e-6)

    def test_shortest_paths_match_floyd_warshall(self):
        w = _rand_w(c=7)
        w[0, 3] = w[3, 0] = 0.0   # knock out an edge: relays matter
        ours = np.asarray(shortest_paths(w))
        ref = _floyd(w)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_disconnected_pair_unreachable(self):
        w = np.zeros((4, 4), np.float32)
        w[0, 1] = w[1, 0] = 1.0
        w[2, 3] = w[3, 2] = 1.0
        d = np.asarray(shortest_paths(w))
        assert d[0, 1] == pytest.approx(1.0)
        assert d[0, 2] > 1e8
        ge = float(global_efficiency(w))
        # only 4 of 12 ordered pairs reachable at distance 1
        assert ge == pytest.approx(4.0 / 12.0)
        assert float(char_path_length(w)) == pytest.approx(1.0)

    def test_clustering_limits(self):
        c = 5
        full = np.ones((c, c), np.float32)
        np.fill_diagonal(full, 0.0)
        np.testing.assert_allclose(np.asarray(clustering_onnela(full)),
                                   1.0, atol=1e-6)
        star = np.zeros((c, c), np.float32)
        star[0, 1:] = star[1:, 0] = 1.0   # hub: no triangles anywhere
        np.testing.assert_allclose(np.asarray(clustering_onnela(star)),
                                   0.0, atol=1e-6)

    def test_clustering_matches_bruteforce(self):
        w = _rand_w(c=6)
        wn = w / w.max()
        wp = np.cbrt(wn)
        ref = np.zeros(6)
        for i in range(6):
            tri = 0.0
            for j in range(6):
                for h in range(6):
                    if i != j and j != h and h != i:
                        tri += wp[i, j] * wp[j, h] * wp[h, i]
            k = (w[i] > 0).sum()
            ref[i] = tri / (k * (k - 1)) if k > 1 else 0.0
        np.testing.assert_allclose(np.asarray(clustering_onnela(w)), ref,
                                   rtol=1e-5)

    def test_batched_over_frequencies(self):
        w = _rand_w(c=5, batch=(3,))
        s = np.asarray(strength(w))
        assert s.shape == (3, 5)
        d = np.asarray(shortest_paths(w))
        for f in range(3):
            np.testing.assert_allclose(d[f], _floyd(w[f]), rtol=1e-5)

    def test_small_world_lattice_beats_uniform(self):
        # a ring lattice (high clustering) vs a flat uniform graph
        c = 16
        ring = np.zeros((c, c), np.float32)
        for i in range(c):
            for off in (1, 2):
                ring[i, (i + off) % c] = ring[(i + off) % c, i] = 1.0
        sig_ring = float(small_worldness(ring, n_nulls=10))
        flat = np.full((c, c), 0.3, np.float32)
        np.fill_diagonal(flat, 0.0)
        sig_flat = float(small_worldness(flat, n_nulls=10))
        assert sig_ring > sig_flat
        assert sig_flat == pytest.approx(1.0, abs=0.05)


def test_adapter_network():
    import ninwavelets_tpu as nw
    rng = np.random.default_rng(7)
    n, e = 256, 10
    t = np.arange(n) / 250.0
    shared = np.sin(2 * np.pi * 20 * t + 0.7)
    data = 0.5 * rng.standard_normal((e, 3, n)).astype(np.float32)
    data[:, 0] += shared.astype(np.float32)
    data[:, 1] += np.roll(shared, 7).astype(np.float32)
    ew = nw.EpochsWavelet(
        nw.ArrayEpochs(data, 250.0, ch_names=["a", "b", "c"]),
        nw.Morse(250.0))
    net = ew.network([15.0, 20.0, 25.0], method="plv", n_nulls=5)
    assert np.asarray(net["matrix"]).shape == (3, 3, 3)
    assert np.asarray(net["strength"]).shape == (3, 3)
    assert np.asarray(net["efficiency"]).shape == (3,)
    assert "small_world" in net
    # the lagged-coupled pair dominates node strength at 20 Hz
    s20 = np.asarray(net["strength"])[1]
    assert s20[2] < s20[0] and s20[2] < s20[1]
    # r4: community split + modularity per frequency
    assert net["communities"].shape == (3, 3)
    assert net["modularity"].shape == (3,)
    # pcoh dispatch works too
    net2 = ew.network([20.0], method="pcoh")
    assert np.asarray(net2["matrix"]).shape == (1, 3, 3)
    with pytest.raises(ValueError):
        ew.network([20.0], method="nope")


class TestModularity:
    def test_planted_two_blocks(self):
        """Two dense blocks with sparse cross links: the leading
        eigenvector recovers the planted split with high modularity."""
        from ninwavelets_tpu.ops.graph import modularity_communities
        rng = np.random.default_rng(0)
        c = 20
        w = 0.02 * rng.random((c, c))
        w[:10, :10] += 0.8 * rng.random((10, 10))
        w[10:, 10:] += 0.8 * rng.random((10, 10))
        w = (w + w.T) / 2
        np.fill_diagonal(w, 0.0)
        labels, q = modularity_communities(w)
        labels = np.asarray(labels)
        # split matches the blocks (up to label swap)
        same = (labels[:10] == labels[0]).all() and \
            (labels[10:] == labels[10]).all() and \
            labels[0] != labels[10]
        assert same, labels
        assert float(q) > 0.3

    def test_structureless_graph_q_zero(self):
        from ninwavelets_tpu.ops.graph import modularity_communities
        # complete uniform graph: B has no positive eigenvalue -> q = 0
        c = 12
        w = np.ones((c, c), np.float32)
        np.fill_diagonal(w, 0.0)
        labels, q = modularity_communities(w)
        assert float(q) <= 1e-6
        assert np.asarray(labels).sum() == 0      # single community

    def test_matches_numpy_oracle(self):
        from ninwavelets_tpu.ops.graph import modularity_communities
        rng = np.random.default_rng(1)
        w = rng.random((8, 8)); w = (w + w.T) / 2
        np.fill_diagonal(w, 0.0)
        labels, q = modularity_communities(w)
        k = w.sum(1); two_m = k.sum()
        b = w - np.outer(k, k) / two_m
        vals, vecs = np.linalg.eigh(b)
        s = np.where(vecs[:, -1] >= 0, 1.0, -1.0)
        want_q = s @ b @ s / (2 * two_m)
        if vals[-1] > 0:
            got = np.asarray(labels).astype(float) * 2 - 1
            agree = np.abs(np.mean(got * s))
            assert agree == 1.0                  # same split (or flip)
            np.testing.assert_allclose(float(q), want_q, rtol=1e-4)


def test_modularity_survives_nan_diagonal():
    """The wpli/ppc matrices carry a NaN diagonal by convention; the
    community split must sanitize it instead of silently returning the
    all-zero 'no structure' answer."""
    from ninwavelets_tpu.ops.graph import modularity_communities
    rng = np.random.default_rng(3)
    w = 0.02 * rng.random((16, 16))
    w[:8, :8] += 0.8 * rng.random((8, 8))
    w[8:, 8:] += 0.8 * rng.random((8, 8))
    w = (w + w.T) / 2
    np.fill_diagonal(w, np.nan)
    labels, q = modularity_communities(w)
    labels = np.asarray(labels)
    assert float(q) > 0.3
    assert (labels[:8] == labels[0]).all() and \
        (labels[8:] == labels[8]).all() and labels[0] != labels[8]
    # batched over a leading frequency axis
    wb = np.stack([w, w])
    lb, qb = modularity_communities(wb)
    assert np.asarray(lb).shape == (2, 16)
    np.testing.assert_allclose(np.asarray(qb), float(q), rtol=1e-5)
