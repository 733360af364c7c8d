"""Sweep-config expansion: every configs/*.json must expand into commands
that the corresponding entry point's argparse accepts, and one cell must run
end-to-end with a tiny model.

Reference counterpart: configs/{taming,rar,chameleon}_{generate,ft}.json
expanded by the meta-launcher (reference configs/chameleon_generate.json:1-48
shows the full grammar: chunk lists, linked encoder/decoder ckpt dicts,
bool sweeps).
"""

import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from launch_chunks import expand  # noqa: E402

CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.json")))


def test_all_six_sweeps_present():
    names = {os.path.basename(p) for p in CONFIGS}
    assert {
        "taming_generate.json", "taming_ft.json",
        "rar_generate.json", "rar_ft.json",
        "chameleon_generate.json", "chameleon_ft.json",
    } <= names


@pytest.mark.parametrize("config", CONFIGS, ids=os.path.basename)
def test_expands_to_valid_invocations(config):
    import generate
    import finetune

    cmds = expand(config)
    assert cmds
    parsers = {"generate.py": generate.get_parser, "finetune.py": finetune.get_parser}
    for cmd in cmds:
        assert cmd[0] == "python"
        parser = parsers[cmd[1]]()
        args = parser.parse_args(cmd[2:])  # SystemExit on unknown/invalid flag
        assert args.outdir


def test_chameleon_generate_grid_shape():
    cmds = expand(os.path.join(REPO, "configs", "chameleon_generate.json"))
    # 25 chunks x (none + noaug + aug*{sync,nosync}) = 100 cells, like the
    # reference sweep.
    assert len(cmds) == 100
    syncs = [cmd[cmd.index("--sync") + 1] for cmd in cmds]
    assert syncs.count("true") == 25
    encs = {cmd[cmd.index("--encoder_ft_ckpt") + 1] for cmd in cmds}
    assert "none" in encs and len(encs) == 3


# Cell counts of the reference's six sweeps (reference configs/*.json):
# generate = chunks x (base + FT + FT+Augs x {sync, nosync}); ft = 1 cell.
EXPECTED_CELLS = {
    "taming_generate.json": 1 * 4,
    "rar_generate.json": 25 * 4,
    "chameleon_generate.json": 25 * 4,
    "taming_ft.json": 1,
    "rar_ft.json": 1,
    "chameleon_ft.json": 1,
}

REF_CONFIGS = "/root/reference/configs"


@pytest.mark.parametrize("name", sorted(EXPECTED_CELLS), ids=str)
def test_grid_cell_counts_match_reference(name):
    cmds = expand(os.path.join(REPO, "configs", name))
    assert len(cmds) == EXPECTED_CELLS[name]
    if os.path.exists(os.path.join(REF_CONFIGS, name)):
        # Same expansion grammar => directly comparable cell counts.
        ref_cfg = json.load(open(os.path.join(REF_CONFIGS, name)))
        ref_params = {
            k: v for k, v in ref_cfg["params"].items() if k != "master_port"
        }
        n_ref = len(list(_count_cells(ref_params)))
        assert len(cmds) == n_ref


def _count_cells(params):
    from launch_chunks import _expand_params

    return _expand_params(params)


def test_generate_grids_carry_attack_axes():
    """The generate sweeps must sweep the 4-method axis with the full attack
    bank on, matching reference configs/taming_generate.json:14-44."""
    for name in ("taming_generate.json", "rar_generate.json"):
        cmds = expand(os.path.join(REPO, "configs", name))
        for cmd in cmds:
            assert cmd[cmd.index("--include_neural_compress") + 1] == "true"
            assert cmd[cmd.index("--include_diffpure") + 1] == "true"
            assert "--syncpath" in cmd
        encs = {cmd[cmd.index("--encoder_ft_ckpt") + 1] for cmd in cmds}
        assert "none" in encs and len(encs) == 3
        conds = {cmd[cmd.index("--conditioning") + 1] for cmd in cmds}
        assert conds == {"1,9,232,340,568,656,703,814,937,975"}


def test_one_cell_tiny_smoke(tmp_path):
    """Run cell 0 of the taming generate sweep with the tiny model."""
    import generate

    cmds = expand(os.path.join(REPO, "configs", "taming_generate.json"))
    argv = cmds[0][2:] + [
        "--tiny",
        "--conditioning", "0",
        "--num_samples_per_conditioning", "1",
        "--batch_size", "1",
        "--no_augs",
        "--num_chunks", "1",
        "--chunk_id", "0",
        # The full-parity sweep turns the heavyweight attack bank on;
        # override for the weightless tiny smoke (argparse keeps the last).
        "--include_neural_compress", "false",
        "--include_diffpure", "false",
        "--syncpath", "none",
        "--outdir", str(tmp_path),
    ]
    generate.main(argv)
    recs = glob.glob(str(tmp_path / "**" / "*.json"), recursive=True)
    assert recs, "tiny sweep cell produced no result records"
    rec = json.load(open(recs[0]))
    assert "pvalue" in json.dumps(rec)
