import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
from mega_minecraft_tpu.terrain import scheduler as S

c = 256
B = S.STAGE_BATCH
sl = jnp.asarray(np.arange(B, dtype=np.int32))
pos = jnp.asarray((np.arange(2*B, dtype=np.int32).reshape(B,2))*16)
d_hf = jnp.zeros((c,16,16), jnp.float32)
d_w = jnp.zeros((c,24,16,16), jnp.float32)
print("heightfield...", flush=True)
d_hf, d_w = S._stage_heightfield(d_hf, d_w, sl, pos)
np.asarray(d_hf[0,0,0]); print("ok", flush=True)

d_layers = jnp.zeros((c,20,16,16), jnp.float32)
nsl = jnp.asarray(np.zeros((B,3,3), np.int32))
print("layers...", flush=True)
d_layers = S._stage_layers(d_layers, d_hf, d_w, nsl, sl, pos, fix_backward=True)
np.asarray(d_layers[0,0,0,0]); print("ok", flush=True)

d_cs = jnp.full((c,16,16,32), 384, jnp.int16); d_ce = d_cs
d_cb = jnp.zeros((c,16,16,32), jnp.uint8); d_ct = d_cb
print("caves...", flush=True)
cs, ce, cb, ct = S._stage_caves(d_hf, d_w, sl, pos)
d_cs = d_cs.at[sl].set(cs); d_ce = d_ce.at[sl].set(ce)
d_cb = d_cb.at[sl].set(cb); d_ct = d_ct.at[sl].set(ct)
np.asarray(d_cs[0,0,0,0]); print("ok", flush=True)

from mega_minecraft_tpu.terrain import feature_placement as fp
fc, cc = fp.CHUNK_FEATURE_CAP, fp.CHUNK_CAVE_FEATURE_CAP
d_sf = {k: jnp.zeros((c, fc), jnp.int32) for k in ("feature","x","y","z","replace")}
d_cf = {k: jnp.zeros((c, cc), jnp.int32) for k in ("feature","x","y","z","height","replace")}
print("feature_placements...", flush=True)
lists = S._stage_feature_placements(d_hf, d_w, d_layers,
    d_cs[sl].astype(jnp.int32), d_ce[sl].astype(jnp.int32),
    d_cb[sl].astype(jnp.int32), d_ct[sl].astype(jnp.int32), sl, pos)
d_sf = {k: v.at[sl].set(lists["surface"][k]) for k, v in d_sf.items()}
d_cf = {k: v.at[sl].set(lists["cave"][k]) for k, v in d_cf.items()}
np.asarray(d_sf["feature"][0,0]); print("ok", flush=True)

d_blocks = jnp.zeros((c,16,16,384), jnp.uint8)
nsl49 = jnp.asarray(np.zeros((B, len(fp.GATHER_OFFSETS)), np.int32))
print("fill...", flush=True)
blocks = S._stage_fill(d_hf, d_w, d_layers,
    d_cs[sl].astype(jnp.int32), d_ce[sl].astype(jnp.int32),
    d_cb[sl].astype(jnp.int32), d_sf, d_cf, sl, nsl49, pos)
d_blocks = d_blocks.at[sl].set(blocks)
np.asarray(d_blocks[0,0,0,0]); print("ok", flush=True)

print("erosion...", flush=True)
gsl = jnp.asarray(np.zeros((24,24), np.int32))
d_layers = S._stage_erosion(d_layers, d_hf, gsl)
np.asarray(d_layers[0,0,0,0]); print("ok", flush=True)
