"""TPU-native adversarial robustness toolkit for learned image compression.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tongxyh/ImageCompression_Adversarial (TCSVT 2023, "Towards Robust Neural
Image Compression: Adversarial Attack and Model Finetuning") plus the
CompressAI codec stack it depends on.

Layering (cf. SURVEY.md §1):
  ops/       bound-STEs, quantizers (custom_vjp)           (ref: utils/ops.py)
  entropy/   factorized + conditional-Gaussian models     (ref: CompressAI entropy models)
  models/    codec families factorized/hyper/context/
             cheng2020/debug                              (ref: anchors/model.py)
  metrics/   psnr, ms-ssim, bpp, VI                       (ref: utils/metrics*.py)
  attacks/   rd, ifgsm/pgd/mifgsm, cw, targeted, patch    (ref: attack_*.py)
  defenses/  self-ensemble, resize, bitdepth, clamping    (ref: self_ensemble.py)
  train/     RD loss, training + adversarial finetuning   (ref: train.py)
  analysis/  feature-range, transfer, recompression, ...  (ref: L6 scripts)
  parallel/  device-mesh sharding helpers                 (green-field, SURVEY §2.7)
  io/        image IO, PyTorch->JAX checkpoint converter  (ref: coder.py:21-48)
  cli/       command-line entry points                    (ref: coder.py:166-219)
"""

__version__ = "0.1.0"
