"""Verify drive: full DL chain on the real TPU + the changed PUSCH-UCI
puncturing path. Asserts CRC pass + bit exactness, corrupted -> False."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from srsue_tpu.phy import chest, enb_tx, equalize, ofdm, pusch, ra
from srsue_tpu.phy.cell import Cell, UlGrant
from srsue_tpu.utils.jaxutil import iq_complex, iq_pairs, to_device_complex, to_host

# ---- 1. PDSCH full chain (25 PRB, 16QAM) on default backend ----
cell = Cell(n_prb=25, cell_id=42)
grant = ra.dl_grant(cell.n_prb, 15)
from srsue_tpu.phy.pdsch import PdschCodec

codec = PdschCodec(cell, grant, rnti=0x1234, subframe=6, cfi=1, n_turbo_iters=8)
rng = np.random.default_rng(0)
B = 4
payloads = np.stack([rng.integers(0, 2, grant.tbs).astype(np.uint8) for _ in range(B)])
tds = []
for pl in payloads:
    grids = enb_tx.build_pdsch_subframe(cell, codec, pl)
    tds.append(enb_tx.to_waveform(cell, grids)[0])
td = np.stack(tds)
p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
noisy, _ = enb_tx.awgn(rng, td, 24.0, signal_power=p_sig)


def rx(iq_p, expected):
    iq = iq_complex(iq_p)
    grid = ofdm.demodulate(cell, iq)
    h, nvar, _ = chest.estimate(cell, grid, 6, port=0)
    x_eq, nv_eff = equalize.zf(codec.extract_re(grid), codec.extract_re(h), nvar)
    payload, tb_ok, _, iters = codec.decode(x_eq, nv_eff)
    match = jnp.mean((payload.astype(jnp.float32) == expected).astype(jnp.float32))
    out = jnp.zeros((8, 128), jnp.float32)
    return out.at[0, 0].set(jnp.sum(tb_ok.astype(jnp.float32))).at[0, 1].set(match)


jit_rx = jax.jit(rx)
t0 = time.time()
s = np.asarray(jit_rx(jnp.asarray(iq_pairs(noisy)), jnp.asarray(payloads, jnp.float32)))
print(f"pdsch clean: {s[0,0]:.0f}/{B} ok, match {s[0,1]:.3f}, {time.time()-t0:.1f}s",
      flush=True)
assert s[0, 0] == B and s[0, 1] == 1.0

# corrupted waveform -> CRC fail, no crash
bad = noisy.copy()
bad[:, 2000:12000] = 0
s2 = np.asarray(jit_rx(jnp.asarray(iq_pairs(bad)), jnp.asarray(payloads, jnp.float32)))
print(f"pdsch corrupted: {s2[0,0]:.0f}/{B} ok (expect 0)", flush=True)
assert s2[0, 0] == 0

# steady-state rate
t0 = time.time()
for _ in range(5):
    s = np.asarray(jit_rx(jnp.asarray(iq_pairs(noisy)), jnp.asarray(payloads, jnp.float32)))
dt = (time.time() - t0) / 5
print(f"steady: {dt*1e3:.1f} ms/batch -> {B*grant.tbs/dt/1e6:.1f} Mbps", flush=True)

# ---- 2. PUSCH UCI puncturing round trip (the changed path) ----
ucell = Cell(n_prb=25, cell_id=12)
g = ra.dl_grant(25, 8)
ug = UlGrant(n_prb=g.n_prb, prb_start=g.prb_start, mcs=g.mcs,
             mod_order=g.mod_order, tbs=g.tbs, rv=0)
pc = pusch.PuschCodec(ucell, ug, rnti=0x99, subframe=2, n_cqi_bits=4, with_ack=True)
pl = rng.integers(0, 2, pc.grant.tbs).astype(np.uint8)
cqi = np.array([1, 0, 1, 1], np.uint8)
wf = pc.encode_sf_uci(pl, cqi_bits=cqi, ack=True)
wf = wf + 0.02 * (rng.standard_normal(wf.shape) + 1j * rng.standard_normal(wf.shape)).astype(np.complex64)
got, ok = pc.decode_sf(to_device_complex(wf[None]), noise_var=8e-4)
assert bool(to_host(ok).all()), "PUSCH UCI decode failed"
np.testing.assert_array_equal(to_host(got)[0].astype(np.uint8), pl)
gcqi, gack = pc.decode_uci()
np.testing.assert_array_equal(gcqi, cqi)
assert gack is True
wf2 = pc.encode_sf_uci(pl, cqi_bits=cqi, ack=False)
pc.decode_sf(to_device_complex(wf2[None]), noise_var=1e-5)
assert pc.decode_uci()[1] is False
print("pusch uci (ACK puncturing): payload+CQI+ACK all recovered", flush=True)
print("DRIVE OK", flush=True)
