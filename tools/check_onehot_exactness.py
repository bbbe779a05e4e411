"""On-chip exactness check for the one-hot selection einsums (r4).

Run on a REAL TPU (the failure is MXU-precision-specific; CPU einsums are
exact f32 and cannot catch it): the default MXU pass casts f32 operands to
bf16, which rounds O(100 A) global coordinates by ~0.5 A (measured before
the fix). All selection einsums now pass precision=HIGHEST; this script
verifies max-abs errors are ~0 / fp-epsilon:

    geometry lanes vs planes on TPU: max abs 0.00e+00
    frames onehot vs gather on TPU:  max abs 3.81e-06
    gather_nodes_onehot on TPU:      max abs 0.00e+00
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from packppi_tpu.geometry.rigid import Rigid
from packppi_tpu.models.ipmp import geometry_features, geometry_features_lanes
from packppi_tpu.geometry.frames import frames_to_atom14_positions
from packppi_tpu.ops.graph import gather_nodes, gather_nodes_onehot

rng = np.random.default_rng(0)
B, L, P, K = 1, 256, 8, 32
p_local = jnp.asarray(rng.normal(0, 2, (B, L, P, 3)).astype(np.float32))
Q = np.linalg.qr(rng.normal(size=(B, L, 3, 3)))[0].astype(np.float32)
t = rng.normal(0, 50, (B, L, 3)).astype(np.float32)
frames = Rigid(jnp.asarray(Q), jnp.asarray(t))
idx = jnp.asarray(rng.integers(0, L, (B, L, K)).astype(np.int32))

ref = jax.jit(geometry_features)(p_local, idx, frames)
got = jax.jit(geometry_features_lanes)(p_local, idx, frames)
err = float(jnp.abs(ref - got).max())
rel = float((jnp.abs(ref - got) / (jnp.abs(ref) + 1e-6)).max())
print(f"geometry lanes vs planes on TPU: max abs {err:.2e}  max rel {rel:.2e}", flush=True)

# frames one-hot vs explicit take_along_axis (old path) on TPU
aatype = jnp.asarray(rng.integers(0, 20, (B, L)).astype(np.int32))
frames8 = Rigid(jnp.asarray(np.linalg.qr(rng.normal(size=(B, L, 8, 3, 3)))[0].astype(np.float32)),
                jnp.asarray(rng.normal(0, 50, (B, L, 8, 3)).astype(np.float32)))
from packppi_tpu.chem import CHEM
def old_take(fr, aat):
    from packppi_tpu.geometry.frames import _take_frames
    from packppi_tpu.geometry.rigid import rigid_apply
    group = jnp.asarray(CHEM.atom14_to_rigid_group)[aat]
    atom_frames = _take_frames(fr, group, axis=-1)
    lit = jnp.asarray(CHEM.atom14_local_positions)[aat]
    mask = jnp.asarray(CHEM.atom14_mask)[aat]
    return rigid_apply(atom_frames, lit) * mask[..., None]
a = jax.jit(old_take)(frames8, aatype)
b = jax.jit(frames_to_atom14_positions)(frames8, aatype)
print(f"frames onehot vs gather on TPU: max abs {float(jnp.abs(a-b).max()):.2e}", flush=True)

# gather_nodes_onehot exactness on TPU for f32 payloads
nodes = jnp.asarray(rng.normal(0, 100, (B, L, 64)).astype(np.float32))
g0 = jax.jit(gather_nodes)(nodes, idx)
g1 = jax.jit(gather_nodes_onehot)(nodes, idx)
print(f"gather_nodes_onehot on TPU: max abs {float(jnp.abs(g0-g1).max()):.2e}", flush=True)
