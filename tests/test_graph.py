"""Tree-schedule parity with the reference graphs (models.py:683-728,
923-949)."""

from fastvideocodec_tpu.gop.graph import (
    graph_from_batch,
    refidx_from_graph,
    tree_schedule,
)


class TestGraphs:
    def test_gop16_tree(self):
        # 15 P-frames -> 5layers graph truncated to 4 layers of 1/2/4/8
        s = tree_schedule(15)
        assert [len(l) for l in s.layers] == [1, 2, 4, 8]
        assert s.layers[0] == (1,)
        assert s.layers[1] == (2, 9)
        assert s.layers[2] == (3, 6, 10, 13)
        # parents consistent: every parent appears in an earlier layer or is 0
        seen = {0}
        for layer in s.layers:
            for fid in layer:
                assert s.parents[fid] in seen
            seen.update(layer)

    def test_ref_index_matches_parents(self):
        s = tree_schedule(15)
        for fid in range(1, 16):
            assert s.ref_index[fid - 1] == s.parents[fid]

    def test_chain_and_onehop(self):
        s = tree_schedule(7, is_linear=True)
        assert [len(l) for l in s.layers] == [1] * 7
        assert all(s.parents[i] == i - 1 for i in range(1, 8))
        s = tree_schedule(7, is_onehop=True)
        assert [len(l) for l in s.layers] == [7]
        assert all(p == 0 for p in s.ref_index)

    def test_small_gops(self):
        for bs, want_layers in [(1, 1), (2, 1), (3, 2), (6, 2), (7, 3), (14, 3)]:
            s = tree_schedule(bs)
            assert s.depth == want_layers, (bs, s.layers)
            assert sum(len(l) for l in s.layers) == bs

    def test_matches_reference_shapes(self):
        g, layers, parents = graph_from_batch(15)
        ref = refidx_from_graph(g, 15)
        assert len(ref) == 15 and all(r >= 0 for r in ref)
