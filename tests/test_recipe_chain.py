"""The reference's five-stage recipe as ONE chained test (VERDICT r3 #3).

/root/reference/README.md:95-124 documents the production workflow:

    1. lightcnn/finetune.py      -> lightCNN_{N}_checkpoint.pth
    2. train_flow.py (forward)   -> checkpoints/flownetf/4_net_flowNet
    3. train_flow.py --reverse   -> checkpoints/flownetb/4_net_flowNet
    4. train_ffwm.py             <- consumes all three stage outputs
    5. test_ffwm.py              <- evaluates stage 4's checkpoints

Each CLI already has its own e2e test; what none of them covered is the
cross-stage checkpoint HANDOFF — stage 4 must find stages 1-3's outputs
under the names those stages actually wrote (no ad-hoc fabrication), and
stage 5 must consume stage 4's trainer-written checkpoints. Stages 2-4 run
with the parser-default --flownetf/--flownetb paths resolving relative to a
temp cwd, exactly like the reference's shell scripts.

Tiny configs (64 px, 4 ids, 4 one-step epochs) on the 8-virtual-device CPU
mesh; programs come from the shared compile cache. Marked slow.
"""

import os
import sys

import pytest

from ffwm_tpu.data.synthetic import make_synthetic_multipie


@pytest.mark.slow
def test_five_stage_recipe_chain(tmp_path, monkeypatch, capsys):
    root = tmp_path
    dataroot = str(root / "dataset")
    make_synthetic_multipie(dataroot, n_ids=4, cameras=("051", "050", "090"),
                            size=64, n_test_ids=2)
    # run from the temp root so the CLIs' default ./checkpoints/... paths
    # resolve here (the reference's train_ffwm.sh relies on the same cwd
    # convention)
    monkeypatch.chdir(root)
    ck = str(root / "checkpoints")

    # ---- stage 1: LightCNN finetune -> checkpoints/lightCNN_1_checkpoint.pth
    import finetune_lightcnn

    monkeypatch.setattr(sys, "argv", [
        "finetune_lightcnn.py", "--dataroot", dataroot, "--save_path", ck,
        "--batch-size", "8", "--epochs", "1", "--num_classes", "8",
        "--load_size", "64", "--print-freq", "64",
    ])
    finetune_lightcnn.main()
    capsys.readouterr()
    lightcnn_pth = os.path.join(ck, "lightCNN_1_checkpoint.pth")
    assert os.path.exists(lightcnn_pth)

    # ---- stages 2+3: forward and reverse flow trainers; 4 one-step epochs
    # so each writes its CLI-default-named artifact {name}/4_net_flowNet
    import train_flow

    for name, extra in (("flownetf", []), ("flownetb", ["--reverse"])):
        monkeypatch.setattr(sys, "argv", [
            "train_flow.py", "--dataroot", dataroot, "--name", name,
            "--checkpoints_dir", ck, "--batch_size", "8", "--load_size", "64",
            "--niter", "4", "--niter_decay", "0", "--save_epoch_freq", "4",
            "--max_dataset_size", "8", "--print_freq", "1000", "--seed", "0",
        ] + extra)
        train_flow.main()
        capsys.readouterr()
        assert os.path.isdir(os.path.join(ck, name, "4_net_flowNet.ckpt")), name

    # ---- stage 4: the GAN trainer consuming all three stage outputs.
    # --flownetf/--flownetb stay at their parser DEFAULTS
    # (./checkpoints/{flownetf,flownetb}/4_net_flowNet — resolved via cwd);
    # --lightcnn points at stage 1's natural output name.
    import train_ffwm

    monkeypatch.setattr(sys, "argv", [
        "train_ffwm.py", "--dataroot", dataroot, "--name", "ffwm",
        "--checkpoints_dir", ck, "--batch_size", "8", "--load_size", "64",
        "--niter", "1", "--niter_decay", "0", "--save_epoch_freq", "1",
        "--max_dataset_size", "8", "--print_freq", "8",
        "--display_freq", "1000", "--lightcnn", lightcnn_pth, "--seed", "0",
    ])
    train_ffwm.main()
    out = capsys.readouterr().out
    # the handoff actually happened: default-path flownets + stage-1 lightcnn
    assert "loading flowNetF from ./checkpoints/flownetf/4_net_flowNet" in out
    assert "loading flowNetB from ./checkpoints/flownetb/4_net_flowNet" in out
    assert f"loading lightCNN from {lightcnn_pth}" in out
    base = os.path.join(ck, "ffwm")
    assert os.path.isdir(os.path.join(base, "latest_net_netG.ckpt"))
    assert os.path.isdir(os.path.join(base, "latest_net_flowNetF.ckpt"))

    # ---- stage 5: eval of the trained GAN via its trainer-written
    # checkpoints (latest_net_{netG,flowNetF}) + the stage-1 LightCNN
    import test_ffwm

    monkeypatch.setattr(sys, "argv", [
        "test_ffwm.py", "--dataroot", dataroot, "--name", "ffwm",
        "--checkpoints_dir", ck, "--batch_size", "2", "--load_size", "64",
        "--lightcnn", lightcnn_pth, "--save_image",
    ])
    test_ffwm.main()
    out = capsys.readouterr().out
    assert "loading flowNetF from orbax latest_net_flowNetF" in out
    assert "loading netG from orbax latest_net_netG" in out
    assert f"loading lightCNN from {lightcnn_pth}" in out
    assert "050:" in out  # per-camera rank-1 lines -> the meter populated
    test_dir = os.path.join(base, "test", "multipie")
    assert any(f.endswith("_fake_F128.png") for f in os.listdir(test_dir))
