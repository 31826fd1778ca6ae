from hashmodnffbanks_idr_tpu.config import hocon

SAMPLE = """
train{
    expname = dtu_fixed_cameras
    learning_rate = 1.0e-4
    num_pixels = 2048
    alpha_milestones = [250,500,750,1000,1250]
    sched_factor = 0.5
}
plot{
    plot_nimgs = 1
    max_depth = 3.0
}
loss{
    eikonal_weight = 0.1
    # doubled the mask weight #
    mask_weight = 200.0
}
dataset{
    data_dir = DTU
    img_res = [1200, 1600]
    scan_id = 65
}
model{
    feature_vector_size = 256
    implicit_network
    {
        d_in = 3
        dims = [ 512, 512, 512 ]
        geometric_init = True
        skip_in = [4]
    }
    ray_tracer
    {
        object_bounding_sphere = 1.0
        sdf_threshold = 5.0e-5
    }
    embedding_network {
        embed_type = StyleModNFFB
        log2_max_hash_size = 5 # Used for HashGrid Table Size
        bound = 0.45
    }
}
"""


def test_parse_reference_shape():
    c = hocon.parse(SAMPLE)
    assert c.get_string("train.expname") == "dtu_fixed_cameras"
    assert c.get_float("train.learning_rate") == 1.0e-4
    assert c.get_int("train.num_pixels") == 2048
    assert c.get_list("train.alpha_milestones") == [250, 500, 750, 1000, 1250]
    assert c.get_list("dataset.img_res") == [1200, 1600]
    assert c.get_bool("model.implicit_network.geometric_init") is True
    assert c.get_float("model.ray_tracer.sdf_threshold") == 5.0e-5
    assert c.get_string("model.embedding_network.embed_type") == "StyleModNFFB"
    assert c.get_float("model.embedding_network.bound") == 0.45
    mc = c.get_config("model")
    assert mc.get_int("feature_vector_size") == 256
    assert "embedding_network" in mc


def test_roundtrip_dump():
    c = hocon.parse(SAMPLE)
    c2 = hocon.parse(c.dump())
    assert c2.data == c.data


def test_parse_real_reference_conf():
    import os

    path = "/root/reference/code/confs/embedder_conf_var/FFB_StyleMod/dtu_fixed_cameras.conf"
    if not os.path.exists(path):
        return
    c = hocon.parse_file(path)
    assert c.get_int("train.num_pixels") == 2048
    assert c.get_string("model.embedding_network.embed_type") == "StyleModNFFB"
    assert c.get_int("model.embedding_network.desired_resolution") == 512


def test_parse_every_reference_and_own_conf():
    import glob
    import os

    paths = glob.glob("/root/reference/code/confs/**/*.conf", recursive=True)
    paths += glob.glob(
        os.path.join(os.path.dirname(__file__), "..",
                     "hashmodnffbanks_idr_tpu", "config", "confs", "**", "*.conf"),
        recursive=True)
    assert paths
    for p in paths:
        c = hocon.parse_file(p)
        assert c.get_int("train.num_pixels", 2048) > 0, p
        assert "model" in c, p
