from fluca_tpu.utils.options import Options


def test_argv_parsing():
    o = Options.from_argv(
        ["-cart_grid_x", "64", "-ns_density", "1.5", "-flag",
         "-neg", "-3.5"]
    )
    assert o.get_int("cart_grid_x") == 64
    assert o.get_real("ns_density") == 1.5
    assert o.get_bool("flag") is True
    assert o.get_real("neg") == -3.5
    assert o.get_int("missing", 7) == 7


def test_prefix_sub():
    o = Options({"ns_abf_schur_ksp_rtol": "1e-8"})
    assert o.sub("ns_").sub("abf_schur_").get_real("ksp_rtol") == 1e-8


def test_set():
    o = Options()
    o.sub("cart_").set("grid_x", 32)
    assert o.get_int("cart_grid_x") == 32
