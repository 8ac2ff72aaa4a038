"""fedicra_tpu: a TPU-native federated weakly-supervised segmentation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
llmir/FedICRA reference (PyTorch + Flower + CUDA): personalized federated
training of U-Net-family segmentation models across heterogeneous medical
imaging sites, each holding a different sparse annotation form.

Subpackages
-----------
- ``models``      : flax.linen model zoo (U-Net family, PCS/LC encoder, PNet)
- ``ops``         : TPU-native compute kernels (Boruvka MST, Euler-tour tree
                    filter with custom VJP, Pallas gated-CRF)
- ``losses``      : partial CE, partial Dice, Gated CRF, tree-energy losses
- ``federation``  : transport-agnostic federated core (in-process mesh
                    simulation, ALA adaptive aggregation, server strategies)
- ``data``        : H5 input pipeline + jit-compiled augmentation
- ``evaluation``  : Dice/HD95/... metrics in pure JAX
- ``parallel``    : mesh/sharding helpers
- ``cli``         : experiment runner / offline test CLI
"""

__version__ = "0.1.0"
