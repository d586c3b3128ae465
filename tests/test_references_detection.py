"""The detection training reference's two loss-plumbing families
(references/detection/train.py; reference engine.py:train_one_epoch sums
the model's loss dict for any --model)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


class TestDetectionTrainer:
    @pytest.mark.parametrize("argv, expect_keys", [
        (["--fake-data", "--epochs", "1", "--steps-per-epoch", "1",
          "--image-size", "64", "--batch-size", "1"],
         None),
        (["--model", "fasterrcnn_resnet50_fpn", "--fake-data", "--epochs", "1",
          "--steps-per-epoch", "1", "--image-size", "64", "--batch-size", "1"],
         None),
    ])
    def test_one_step_runs_and_losses_finite(self, argv, expect_keys, capsys):
        from references.detection.train import main

        params = main(argv)
        out = capsys.readouterr().out
        assert "step 0" in out and "mAP" in out
        assert "nan" not in out
        total = sum(float(np.abs(np.asarray(x)).sum())
                    for x in __import__("jax").tree.leaves(params))
        assert np.isfinite(total)

    def test_synthetic_batching_contract(self):
        """--synthetic pads SyntheticShapesDetection samples into the fixed
        (boxes, labels, valid) arrays the jitted step expects."""
        from cpu_vision_tpu.datasets import SyntheticShapesDetection

        ds = SyntheticShapesDetection(4, (64, 64, 3), 10)
        img, tgt = ds[0]
        assert tgt["boxes"].shape == (1, 4) and tgt["labels"].shape == (1,)
        # labels are 0-based foreground; the two-stage path offsets by +1
        assert 0 <= int(tgt["labels"][0]) < 10
