"""imagecaptioning_tpu — a TPU-native image-captioning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AlexIMOVI/ImageCaptioning (PyTorch, single GPU): whole-image face
captioning (AlexCap), dense captioning with ground-truth boxes
(AlexGTModel) and a full RPN dense-captioning pipeline (DenseCap) —
rebuilt around jit-compiled train steps, `lax.scan` decoders, fused
beam search, Pallas ROI kernels and `jax.sharding` device meshes.

Layout
------
- ``config``    experiment configs mirroring the reference's ``*_opts.py``
- ``data``      tokenizer/vocab, HDF5 pipelines, synthetic datasets
- ``ops``       losses, RNN/transformer primitives, boxes, ROI, beam search
- ``models``    the four AlexCap captioners + DenseCap model families
- ``parallel``  meshes, shardings, sharded train steps
- ``train``     optimizers, training drivers, checkpointing
- ``eval``      METEOR/BLEU and dense-captioning mAP harnesses
- ``utils``     IO, logging, torch-checkpoint porting
"""

__version__ = "0.1.0"
