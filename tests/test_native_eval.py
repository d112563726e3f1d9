

def test_match_greedy_native_vs_python():
    import numpy as np
    from vnext_tpu.evaluation import native
    from vnext_tpu.evaluation.ytvos_eval import _match_greedy

    assert native.available()
    rng = np.random.RandomState(0)
    thrs = np.linspace(0.5, 0.95, 10)
    for trial in range(20):
        d = rng.randint(1, 12)
        g = rng.randint(0, 8)
        iou = rng.rand(d, g)
        ign = rng.rand(g) < 0.3
        nat = native.match_greedy_native(iou, ign, thrs)
        # force the python fallback by calling the body directly
        import vnext_tpu.evaluation.ytvos_eval as ye
        avail = native.available
        try:
            native.available = lambda: False
            py = _match_greedy(iou, ign, thrs)
        finally:
            native.available = avail
        np.testing.assert_array_equal(nat[0], py[0], err_msg=f"matched trial {trial}")
        np.testing.assert_array_equal(nat[1], py[1], err_msg=f"ignored trial {trial}")
