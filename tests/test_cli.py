"""CLI surface: every subcommand parses and dispatches correctly."""

import pytest

from segtpu import main_search


@pytest.mark.parametrize("argv,fn_name", [
    (["search", "--synthetic", "--num-iters", "1"], "cmd_search"),
    (["search", "--supernet", "4", "--ctrl-version", "wacv"], "cmd_search"),
    (["search", "--supernet", "8", "--pop-devices", "4"], "cmd_search"),
    (["search", "--fleet", "--ctrl-algo", "reinforce"], "cmd_search"),
    (["train", "--synthetic", "--num-epochs", "1"], "cmd_train"),
    (["eval", "--data-root", "d", "--val-list", "v.lst"], "cmd_eval"),
    (["infer", "--image", "x.png", "--arch", "arch1"], "cmd_infer"),
    (["bench", "--arch", "arch2"], "cmd_bench"),
    (["fidelity", "--golden", "g.npz"], "cmd_fidelity"),
])
def test_subcommands_parse(argv, fn_name, monkeypatch):
    captured = {}

    def fake(args):
        captured["fn"] = fn_name
        captured["args"] = args

    monkeypatch.setattr(main_search, fn_name, fake)
    main_search.main(argv)
    assert captured["fn"] == fn_name


def test_search_flag_mapping():
    """Reference flag names survive into the config (SURVEY §5.6)."""
    import argparse
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    ps = sub.add_parser("search")
    main_search._add_search_flags(ps)
    args = ap.parse_args([
        "search", "--dec-aux-weight", "0.4", "--ctrl-baseline-decay", "0.9",
        "--lstm-hidden-size", "64", "--meta-train-prct", "0.8",
        "--crop-size", "128", "96", "--num-epochs", "3", "2",
        "--do-kd", "--kd-coeff", "0.7"])
    cfg = main_search._cfg_from_args(args)
    assert cfg.dec_aux_weight == 0.4
    assert cfg.ctrl_baseline_decay == 0.9
    assert cfg.lstm_hidden_size == 64
    assert cfg.crop_size == (128, 96)
    assert cfg.num_epochs == (3, 2)
    assert cfg.do_kd and cfg.kd_coeff == 0.7


def test_bad_subcommand_rejected():
    with pytest.raises(SystemExit):
        main_search.main(["explode"])
