"""CLI flag surface: names and defaults match the reference options.py."""

from thermal_semantic_segmentation_tpu.cli.options import (
    calc_proto_parse, evaluation_parse, pseudo_generation_parse, seg_parse,
    self_train_parse, train_parse, translation_parse)


def test_train_parse_defaults():
    a = train_parse().parse_args([])
    assert a.batch_size == 4 and a.num_epoch == 65 and a.lr == 0.0001
    assert a.source_dataset == "kitti" and a.target_dataset == "freiburg_ir"
    assert a.s2t_input_nc == 3 and a.t2s_input_nc == 1
    assert a.canny_thermal_threshold == 1 and a.canny_rgb_threshold == 2.5
    assert a.checkpoint_name == "freiburg_rgb2ir.pth"


def test_seg_parse_defaults():
    a = seg_parse().parse_args([])
    assert a.epochs == 50 and a.batch_size == 8 and a.num_classes == 13
    assert a.ignore_index == 12 and a.net_mode == "one_channel"
    assert a.dataset == "cityscapes_translation"
    assert a.translation_name == "freiburg_rgb2ir_130epochs"


def test_evaluation_parse_defaults():
    a = evaluation_parse().parse_args([])
    assert a.val_batch_size == 1 and a.num_classes == 13
    assert a.dataset == "freiburg_ir" and a.ignore_index == 12
    assert a.checkpoint_name == "256_freiburg_rgb2ir_segmentation.pth"


def test_self_train_parse_defaults():
    a = self_train_parse().parse_args([])
    assert a.resize == 1200 and tuple(a.rcrop) == (512, 256) and a.hflip == 0.5
    assert a.proto_temperature == 0.5 and a.threshold == 0.3
    assert a.rce_alpha == 0.1 and a.rce_beta == 1.0
    assert a.proto_momentum == 0.0001 and a.lr == 1e-6
    assert a.new_checkpoint_name == "256_freiburg_rgb2ir_tem_0.5_thres_0.3_segmentation.pth"


def test_misc_parsers():
    a = calc_proto_parse().parse_args([])
    assert a.batch_size == 64 and a.epochs == 4 and a.with_feat is True
    b = pseudo_generation_parse().parse_args([])
    assert b.pseudo_type == "hard" and b.soft is False
    c = translation_parse().parse_args([])
    assert tuple(c.save_image_size) == (1024, 2048) and c.generator_type == "s2t"


def test_str2bool_fixes_reference_trap():
    """type=bool in the reference makes '-flag false' truthy; ours parses it."""
    a = seg_parse().parse_args(["-data_split", "false"])
    assert a.data_split is False
    a = seg_parse().parse_args(["-data_split", "true"])
    assert a.data_split is True


def test_every_reference_flag_is_accepted():
    """Scrape each reference parser's add_argument flag names from
    /root/reference/options.py (and the inline parsers in
    self_train_main.py / generate_pseudo_label.py) and assert our matching
    parser accepts every one — a command line written for the reference
    must never hit 'unrecognized arguments' here."""
    import re

    from thermal_semantic_segmentation_tpu.cli import options as opts

    src = open("/root/reference/options.py").read()
    funcs = re.split(r"\ndef (\w+)\(\):", src)
    ref = {}
    for name, body in zip(funcs[1::2], funcs[2::2]):
        ref[name] = re.findall(
            r"^\s*parser\.add_argument\(\s*'(-{1,2}[\w]+)'", body, re.M)
    inline = {}
    for fname, key in (("self_train_main.py", "self_train_parse"),
                       ("generate_pseudo_label.py", "pseudo_generation_parse")):
        body = open(f"/root/reference/{fname}").read()
        inline[key] = re.findall(
            r"^\s*parser\.add_argument\(\s*'(-{1,2}[\w]+)'", body, re.M)

    pairs = {
        "train_parse": opts.train_parse,
        "translation_parse": opts.translation_parse,
        "seg_parse": opts.seg_parse,
        "evaluation_parse": opts.evaluation_parse,
        "calc_proto_parse": opts.calc_proto_parse,
        "pseudo_generation_parse": opts.pseudo_generation_parse,
    }
    assert set(pairs) == set(ref), f"parser set drifted: {set(ref)}"
    missing = []
    for name, factory in pairs.items():
        accepted = set(factory()._option_string_actions)
        for flag in ref.get(name, []):
            if flag not in accepted:
                missing.append(f"{name}: {flag}")
    for key, flags in inline.items():
        accepted = set(getattr(opts, key)()._option_string_actions)
        for flag in flags:
            if flag not in accepted:
                missing.append(f"{key}: {flag}")
    assert not missing, f"reference flags not accepted: {missing}"


def test_data_parallel_flag_on_every_parser():
    """--data_parallel rides the shared _add_roots block: every CLI parser
    (including serve's) must accept it as a real boolean."""
    from thermal_semantic_segmentation_tpu.cli.serve import serve_parse

    for factory in (train_parse, seg_parse, evaluation_parse,
                    self_train_parse, calc_proto_parse,
                    pseudo_generation_parse, translation_parse, serve_parse):
        a = factory().parse_args(["--data_parallel", "true"])
        assert a.data_parallel is True, factory
        a = factory().parse_args([])
        assert a.data_parallel is False, factory


def test_distributed_flag_triggers_init(monkeypatch):
    """--distributed initializes jax.distributed at parse time (before any
    CLI main touches a device) and maps the manual-bring-up flags through;
    the default must never initialize."""
    from thermal_semantic_segmentation_tpu.parallel import mesh as pmesh

    calls = []
    monkeypatch.setattr(pmesh, "init_distributed",
                        lambda **kw: calls.append(kw) or True)

    seg_parse().parse_args([])
    assert calls == []  # default: no distributed runtime

    seg_parse().parse_args(["--distributed", "true"])
    assert calls == [{}]  # TPU-pod auto-detect path: no kwargs

    seg_parse().parse_args([
        "--distributed", "true", "--coordinator_address", "h0:1234",
        "--num_processes", "4", "--process_id", "2"])
    assert calls[-1] == {"coordinator_address": "h0:1234",
                         "num_processes": 4, "process_id": 2}


def test_init_distributed_is_idempotent(monkeypatch):
    """A process already inside a distributed runtime (chained in-process CLI
    invocations) must not re-initialize — jax raises on a second init."""
    from jax._src import distributed

    from thermal_semantic_segmentation_tpu.parallel import mesh as pmesh

    inits = []
    monkeypatch.setattr("jax.distributed.initialize",
                        lambda **kw: inits.append(kw))

    monkeypatch.setattr(distributed.global_state, "client", object(),
                        raising=False)
    assert pmesh.init_distributed() is False
    assert inits == []

    monkeypatch.setattr(distributed.global_state, "client", None,
                        raising=False)
    assert pmesh.init_distributed(num_processes=1) is True
    assert inits == [{"num_processes": 1}]
