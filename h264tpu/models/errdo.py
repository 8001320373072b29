"""Loss-aware encoding: K-decoder channel simulation (SURVEY F20).

TPU-native equivalent of the reference's RDO-with-losses machinery
(FR/src/decoder.c: `decode_one_mb` :146, `UpdateDecoders` :361,
`Build_Status_Map` :449, `Error_Concealment` :494; JM `errdo.c`): the encoder
runs K simulated decoder copies, each losing every macroblock independently
with probability p.  Lost MBs are concealed by the co-located copy from that
decoder's own previous reconstruction (frame-copy concealment, the ERC
fallback `FR/src/erc_do_p.c` both codecs use for whole-MB loss).  The
per-MB distortion between the encoder's reconstruction and the simulated
decoders' states estimates the channel-induced drift; MBs whose expected
drift exceeds a threshold are forced intra next time (the decision
`RDOptimization=2` folds into the Lagrangian cost).

TPU design: the K decoders are a leading batch axis [K, H, W] living on
device; one step is a single fused select + distortion reduction (no host
loop over decoders or MBs).  Loss patterns come from `jax.random` with an
explicit key, so simulation is reproducible and shard-invariant — the
reference's `rand()`-driven `Build_Status_Map` made runs machine-dependent.
"""

import functools

import jax
import jax.numpy as jnp

MB = 16


@functools.partial(jax.jit, static_argnames=("p_loss",))
def _sim_step(sim_refs, enc_recon, key, p_loss: float):
    """One frame of channel simulation.

    sim_refs  [K, H, W] — each decoder's previous reconstruction
    enc_recon [H, W]    — encoder-side reconstruction of the current frame
    Returns (new_sim [K, H, W], mb_drift [H/16, W/16] f32 mean-SSE per MB).
    """
    K, H, W = sim_refs.shape
    lost = jax.random.bernoulli(key, p_loss, (K, H // MB, W // MB))
    lost_pix = jnp.repeat(jnp.repeat(lost, MB, 1), MB, 2)
    new_sim = jnp.where(lost_pix, sim_refs, enc_recon[None])
    err = (new_sim - enc_recon[None]).astype(jnp.float32) ** 2
    mb_err = err.reshape(K, H // MB, MB, W // MB, MB).sum(axis=(2, 4))
    return new_sim, mb_err.mean(axis=0) / (MB * MB)


class KDecoderSim:
    """K simulated decoders with per-MB Bernoulli loss and frame-copy
    concealment (decoder.c:361 `UpdateDecoders` semantics)."""

    def __init__(self, k: int, p_loss: float, height: int, width: int,
                 seed: int = 0):
        self.k = k
        self.p_loss = float(p_loss)
        self.height, self.width = height, width
        self.key = jax.random.PRNGKey(seed)
        self.sim = None    # [K, H, W] int32

    def reset(self, recon):
        """IDR: every decoder receives the intra frame intact apart from its
        own losses of THIS frame (an IDR MB lost is still concealed)."""
        self.sim = jnp.broadcast_to(
            jnp.asarray(recon, jnp.int32), (self.k, self.height, self.width))

    def step(self, enc_recon):
        """Advance all decoders by one frame; returns the expected per-MB
        drift map [H/16, W/16] (mean squared error per pixel vs the
        encoder's reconstruction, averaged over decoders)."""
        enc_recon = jnp.asarray(enc_recon, jnp.int32)
        if self.sim is None:
            self.reset(enc_recon)
        self.key, sub = jax.random.split(self.key)
        self.sim, drift = _sim_step(self.sim, enc_recon, sub, self.p_loss)
        return drift

    def force_intra_mask(self, drift, threshold: float):
        """MBs whose expected channel drift exceeds `threshold` (mean SSE
        per pixel) — feed to the frame driver as a forced-intra mask, the
        batched analogue of folding K-decoder distortion into the per-MB
        mode decision (JM errdo.c / md_highloss.c)."""
        return drift > threshold
