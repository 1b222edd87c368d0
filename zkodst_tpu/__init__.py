"""zkodst_tpu — a TPU-native zero-knowledge proving library.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of the
reference repo (amit0365/zk-odst): a halo2-style BLAKE2f (EIP-152) compression
circuit built on the spread/lookup-table XOR technique, plus the full
keygen -> prove -> verify PLONKish pipeline over KZG/BN254 with SHPLONK
multiopen and a Blake2b transcript.

Layer map (TPU-first, cf. /root/repo/SURVEY.md §7):
  ops/       field arithmetic (limb-vectorized), u64 bit ops, BLAKE2b, NTT,
             elliptic-curve ops, MSM — the compute kernels (JAX now, Pallas
             for the hot paths).
  circuits/  the circuit IR (columns-as-arrays, static gate list), the
             BLAKE2f circuit + vmapped witness generator, and the vectorized
             mock constraint checker (MockProver equivalent).
  proof/     the proving pipeline: evaluation domains, KZG SRS/commitments,
             lookup & permutation arguments, vanishing/quotient, SHPLONK,
             transcript, keygen, prover, verifier.
  parallel/  mesh + sharding helpers: domain-sharded NTT, point-sharded MSM,
             batch-sharded witness generation over jax.sharding.Mesh.
  utils/     timers, serialization, config.
"""

__version__ = "0.1.0"
