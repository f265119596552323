"""zkemail_tpu — a TPU-native zero-knowledge email-proof framework.

A from-scratch JAX/Pallas reimplementation of the capabilities of
zkemail/zk-email-verify (mounted read-only at /root/reference): DKIM email
verification compiled to R1CS, batched witness generation, and a Groth16
prover (Pippenger MSM + radix-2 NTT over BN254) designed for TPU meshes.

Layout:
  core/      BN254 field + curve arithmetic (limb vector core, Poseidon, pairing)
  circuits/  constraint-builder DSL + the gadget library ("the model")
  models/    flagship assembled circuits (EmailVerifier and variants)
  helpers/   host email pipeline (DKIM, canonicalization, input generation)
  prover/    Groth16 setup/prove (NTT, MSM) and proof containers
  ops/       TPU kernels (Pallas) and batched primitive ops
  parallel/  device-mesh sharding strategies (DP over emails, sharded MSM/NTT)
  contracts/ Solidity registry contracts + packing utils parity
"""

__version__ = "0.1.0"
