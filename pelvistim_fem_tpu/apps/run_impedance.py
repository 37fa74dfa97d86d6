#!/usr/bin/env python3
"""Electrode impedance spectroscopy of the pressure-contact model.

What electrode-impedance measurement hardware actually reports is a
SPECTRUM Z(f) — the reference approximates the capacitive electrode-skin
interface by sweeping a purely real sigma_contact at DC (step04
run_pressure_sweep.py:55-215).  This app solves the frequency-domain
electro-quasistatic problem (ops/eqs.py: complex admittivity
sigma + i omega eps0 epsr, certified COCG solves) on the SAME step04
model and reports Bode magnitude/phase per contact condition: each
(contact state x frequency) point reuses ONE assembled operator — the
whole grid of solves is two nested material-table batches with zero
re-assembly.

Usage: python apps/run_impedance.py [--smoke] [--plot]
                                    [--outdir results_impedance]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

# Relative permittivities, literature-order placeholders (declared in
# the same spirit as the reference's PLACEHOLDER conductivities, step03
# params.yaml:4-6).  Tissue epsilon_r at 10-100 kHz is enormous
# (muscle ~1e5-1e6: Gabriel 1996 dispersion data); the gel/skin contact
# carries the electrode double layer, by far the dominant capacitance.
EPSR = {
    "muscle": 2.0e5,
    "fat": 2.0e4,
    "skin": 3.0e4,
    "contact": 5.0e6,
}


def main():
    ap = argparse.ArgumentParser(description="Impedance spectroscopy")
    ap.add_argument("--smoke", action="store_true",
                    help="(kept for CLI parity; the coarse mesh is the "
                         "default here — spectra are mesh-insensitive)")
    ap.add_argument("--full", action="store_true",
                    help="full step04 resolution")
    ap.add_argument("--outdir", default="results_impedance")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--dispersive", action="store_true",
                    help="Cole-Cole dispersive tissue (sigma(f), "
                         "eps(f)) instead of constant eps_r")
    ap.add_argument("--pulse", action="store_true",
                    help="synthesize the electrode voltage V(t) over "
                         "the programmed biphasic pulse (stim params: "
                         "pulse_width_us, injected_current_mA) per "
                         "contact state — the capacitive charging "
                         "transient the static model cannot express")
    ap.add_argument("--pulse-harmonics", type=int, default=200,
                    help="harmonic cutoff for --pulse (bandwidth = "
                         "n/analysis period)")
    ap.add_argument("--rom", action="store_true",
                    help="dense 61-point spectra via the greedy "
                         "certified reduced basis (ops/rom.py): one "
                         "warm-started basis serves all three contact "
                         "states, ~10-15 full complex solves total "
                         "instead of 183 — same 1e-8 certificate per "
                         "frequency")
    ap.add_argument("--cem", action="store_true",
                    help="model the interface as a complete-electrode-"
                         "model CPE boundary impedance z(f) instead of "
                         "a meshed gel layer: the constant-phase "
                         "signature real interfaces show and a meshed "
                         "RC layer cannot produce")
    args = ap.parse_args()

    import jax.numpy as jnp

    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops.bc import electrode_node_masks
    from pelvistim_fem_tpu.ops.eqs import impedance_spectrum
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
    from pelvistim_fem_tpu.utils.summary import save_results

    t0 = time.perf_counter()
    spec, params = build_pressure_spec(coarse=not args.full)
    scase, hier = assemble_lattice(spec, jnp.float64)
    t_build = time.perf_counter() - t0
    print(f"  spec+assemble (ONCE for every point): grid "
          f"{spec.grid_shape}, {t_build:.1f} s")

    # element mesh only for the electrode node patches (weights)
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    case, _ = build_pressure_case(coarse=not args.full,
                                  to_device=False)
    act, ret = electrode_node_masks(np.asarray(case.faces),
                                    np.asarray(case.face_bcid),
                                    case.n_nodes)
    w_act = act / act.sum()
    w_ret = ret / ret.sum()

    n_b = spec.n_bodies
    epsr = np.zeros(n_b + 1)
    epsr[core.BODY_MUSCLE] = EPSR["muscle"]
    epsr[core.BODY_FAT] = EPSR["fat"]
    epsr[core.BODY_SKIN] = EPSR["skin"]
    epsr[core.BODY_CONTACT_ACTIVE] = EPSR["contact"]
    epsr[core.BODY_CONTACT_RETURN] = EPSR["contact"]

    # 1 Hz .. 100 kHz; the ROM path affords a dense grid (its cost is
    # the BASIS rank, not the frequency count)
    freqs = np.logspace(0, 5, 61 if args.rom else 11)
    base = np.asarray(spec.sigma_table)
    sweep = params["pressure_sweep"]["sigma_contact_Spm"]
    # three contact states: dry (p01), nominal mid, wet/pressed (p15)
    states = [("dry", sweep[0]), ("mid", sweep[len(sweep) // 2]),
              ("wet", sweep[-1])]

    from pelvistim_fem_tpu.ops.eqs import impedance_spectrum_tables
    rows, spectra = [], {}
    shared_rom, rom_solves = None, 0
    t0 = time.perf_counter()
    for name, s_c in states:
        tab = base.copy()
        tab[core.BODY_CONTACT_ACTIVE] = s_c
        tab[core.BODY_CONTACT_RETURN] = s_c
        if args.dispersive:
            # Cole-Cole dispersive tissue: sigma and eps both vary with
            # frequency (single-pole literature-order placeholders);
            # still one material-table batch on the same operator.
            from pelvistim_fem_tpu.ops.eqs import dispersive_tables
            disp = {
                core.BODY_MUSCLE: (base[core.BODY_MUSCLE], 1.0e3,
                                   [(EPSR["muscle"], 3.0e-4, 0.1)]),
                core.BODY_FAT: (base[core.BODY_FAT], 1.0e2,
                                [(EPSR["fat"], 1.0e-4, 0.1)]),
                core.BODY_SKIN: (base[core.BODY_SKIN], 1.0e3,
                                 [(EPSR["skin"], 5.0e-4, 0.2)]),
                core.BODY_CONTACT_ACTIVE: (s_c, 1.0e3,
                                           [(EPSR["contact"], 1.0e-3,
                                             0.2)]),
                core.BODY_CONTACT_RETURN: (s_c, 1.0e3,
                                           [(EPSR["contact"], 1.0e-3,
                                             0.2)]),
            }
            kr, ki = dispersive_tables(freqs, tab, disp)
        else:
            from pelvistim_fem_tpu.ops.eqs import EPS0
            ki = jnp.asarray(2 * np.pi * freqs[:, None]
                             * EPS0 * epsr[None, :])
            kr = jnp.tile(jnp.asarray(tab, jnp.float64),
                          (len(freqs), 1))
        if args.rom:
            from pelvistim_fem_tpu.ops.rom import \
                rom_impedance_spectrum_tables
            # ONE warm-started basis across the contact states: the
            # reduced blocks are table-independent, so the dry state's
            # snapshots keep certifying mid/wet frequencies
            sp = rom_impedance_spectrum_tables(
                scase, hier, ki, kr, freqs, w_act=w_act, w_ret=w_ret,
                tol=1e-8, rom=shared_rom, max_snapshots=80)
            shared_rom = sp["rom"]
            rom_solves += sp["n_full"]
            print(f"  [{name}] ROM: {sp['n_full']} full complex "
                  f"solves for {len(freqs)} certified frequencies "
                  f"(basis rank {int(shared_rom.rank)})")
        else:
            sp = impedance_spectrum_tables(scase, hier, ki, kr, freqs,
                                           w_act=w_act, w_ret=w_ret,
                                           tol=1e-8)
        assert sp["converged"].all(), name
        spectra[name] = sp
        for f, z, zmag, ph in zip(freqs, sp["Z"], sp["Z_abs"],
                                  sp["Z_phase_deg"]):
            rows.append({"state": name, "sigma_contact_Spm": s_c,
                         "freq_hz": f, "Z_re_ohm": z[0],
                         "Z_im_ohm": z[1], "Z_abs_ohm": zmag,
                         "Z_phase_deg": ph})
        knee = zmag = sp["Z_abs"]
        print(f"  [{name}] sigma_c={s_c:g} S/m: |Z| "
              f"{knee[0]:.0f} -> {knee[-1]:.0f} ohm "
              f"(1 Hz -> 100 kHz), min phase "
              f"{sp['Z_phase_deg'].min():.1f} deg, max true residual "
              f"{sp['residual'].max():.1e}")
    t_solve = time.perf_counter() - t0
    n_pts = len(states) * len(freqs)
    if args.rom:
        print(f"  {n_pts} frequencies certified at 1e-8 from "
              f"{rom_solves} full complex solves (shared basis rank "
              f"{int(shared_rom.rank)}) in {t_solve:.2f} s")
    else:
        print(f"  {n_pts} certified complex solves in {t_solve:.2f} s "
              f"({n_pts*60/t_solve:.0f} solves/min)")

    save_results(rows, Path(args.outdir), stem="impedance")

    cem_spectra = {}
    if args.cem:
        # Interface as a CEM boundary impedance: the thin gel volume is
        # absorbed INTO z(f) (a thin layer is exactly z = t/kappa) and
        # its mesh bodies filled with skin; the electrode metal's
        # equipotential shunt is the CEM's rank-1 term, NOT a meshed
        # conductor (a metal-like gel body at 25000x contrast defeats
        # the geometric V-cycle — measured).  The series-R + constant-
        # phase element z(f) then carries the whole interface: the
        # CPE's -alpha*90 deg constant phase is what measured electrode
        # spectra actually show; a meshed RC layer (above) can only
        # produce a single-pole phase that returns to 0.
        from pelvistim_fem_tpu.ops.cem import (cem_weights_from_bcids,
                                               cpe_contact_impedance,
                                               stencil_cem_setup,
                                               solve_stencil_cem_eqs_refined)
        from pelvistim_fem_tpu.ops.eqs import admittivity_imag_table
        from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                                   stencil_host_data)
        t0 = time.perf_counter()
        case_m, _, mesh_m = build_pressure_case(coarse=not args.full,
                                                to_device=False,
                                                with_mesh=True)
        hd = stencil_host_data(case_m, mesh_m)
        sc_cem = build_stencil_case(case_m, mesh_m, dtype=jnp.float64,
                                    host_data=hd)
        W = cem_weights_from_bcids(case_m)
        Wg, present, hier_cem = stencil_cem_setup(hd, W, ground=1)
        tab_cem = base.copy()
        tab_cem[core.BODY_CONTACT_ACTIVE] = base[core.BODY_SKIN]
        tab_cem[core.BODY_CONTACT_RETURN] = base[core.BODY_SKIN]
        epsr_cem = epsr.copy()
        epsr_cem[core.BODY_CONTACT_ACTIVE] = EPSR["skin"]
        epsr_cem[core.BODY_CONTACT_RETURN] = EPSR["skin"]
        print(f"  CEM interface setup: {time.perf_counter()-t0:.1f} s")

        # contact states now = interface conditions: dry gel has a
        # large series R and low CPE magnitude; wet/pressed the reverse
        cem_states = [("dry", dict(z_ser=3e-2, q_cpe=0.05, alpha=0.85)),
                      ("mid", dict(z_ser=8e-3, q_cpe=0.2, alpha=0.85)),
                      ("wet", dict(z_ser=2e-3, q_cpe=0.8, alpha=0.9))]
        t0 = time.perf_counter()
        cem_rows, n_solve = [], 0
        for name, cpe in cem_states:
            zf = cpe_contact_impedance(freqs, **cpe)
            Z = np.zeros(len(freqs), complex)
            resid = np.zeros(len(freqs))
            for i, f in enumerate(freqs):
                ki = admittivity_imag_table(jnp.asarray(epsr_cem),
                                            2 * np.pi * f)
                z2 = jnp.asarray([[zf[i].real, zf[i].real],
                                  [zf[i].imag, zf[i].imag]])
                res = solve_stencil_cem_eqs_refined(
                    sc_cem, hier_cem, Wg, present, z2,
                    jnp.asarray([1.0, 0.0]), ki_table=ki,
                    kr_table=jnp.asarray(tab_cem), ground=1, tol=1e-8)
                assert bool(np.asarray(res.converged)), (name, f)
                U = np.asarray(res.U)
                Z[i] = U[0, 0] + 1j * U[1, 0]       # unit drive
                resid[i] = float(np.asarray(res.residual))
                n_solve += 1
            cem_spectra[name] = Z
            ph = np.degrees(np.angle(Z))
            print(f"  [cem {name}] |Z| {abs(Z[0]):.0f} -> "
                  f"{abs(Z[-1]):.0f} ohm, phase {ph.min():.1f} .. "
                  f"{ph.max():.1f} deg (CPE plateau "
                  f"~{-cpe['alpha']*90:.0f}), max residual "
                  f"{resid.max():.1e}")
            for f, zc in zip(freqs, Z):
                cem_rows.append({"state": name, "freq_hz": f,
                                 "Z_re_ohm": zc.real,
                                 "Z_im_ohm": zc.imag,
                                 "Z_abs_ohm": abs(zc),
                                 "Z_phase_deg": np.degrees(
                                     np.angle(zc))})
        print(f"  CEM spectra: {n_solve} certified complex CEM solves "
              f"in {time.perf_counter()-t0:.2f} s")
        save_results(cem_rows, Path(args.outdir), stem="impedance_cem")

    pulses = {}
    if args.pulse:
        from pelvistim_fem_tpu.ops.waveform import (
            biphasic_pulse_samples, pulse_response)
        stim = params["stim"]
        amp = stim["injected_current_mA"] * 1e-3
        pw = stim["pulse_width_us"] * 1e-6
        # Analysis period: the programmed 10 Hz period is 0.4% duty —
        # the interface fully discharges (tau = eps0 epsr_c / sigma_c
        # <= ~1 ms even dry) long before the next pulse, so a 10 ms
        # analysis period reaches the same periodic steady state with
        # 10x the harmonic bandwidth per solve.
        period = 10e-3
        t, i = biphasic_pulse_samples(period, amp, pw, n_samples=4096)
        w = (w_act - w_ret)[None, :]
        t0 = time.perf_counter()
        pulse_rows, n_solves = [], 0
        for name, s_c in states:
            tab = base.copy()
            tab[core.BODY_CONTACT_ACTIVE] = s_c
            tab[core.BODY_CONTACT_RETURN] = s_c
            pr = pulse_response(scase, hier, i, period, w,
                                epsr_table=jnp.asarray(epsr),
                                kr_table=tab,
                                n_harm=args.pulse_harmonics, tol=1e-8,
                                rom_snapshots=60 if args.rom else None)
            assert pr["converged"].all(), name
            if args.rom:
                n_solves += pr["n_full"]
                print(f"  [pulse {name}] ROM: {pr['n_full']} full "
                      f"complex solves for "
                      f"{len(pr['active_harmonics'])} active harmonics")
            else:
                n_solves += len(pr["active_harmonics"])
            v = pr["series"][:, 0]
            pulses[name] = (t, i, v)
            ph1 = (t > 0.05 * pw) & (t < 0.95 * pw)
            z_dc = spectra[name]["Z_abs"][0]
            row = {
                "state": name, "sigma_contact_Spm": s_c,
                "peak_V": float(np.abs(v).max()),
                "static_ZI_V": float(z_dc * amp),
                "phase1_start_V": float(v[ph1][0]),
                "phase1_end_V": float(v[ph1][-1]),
                "creep_V": float(v[ph1][-1] - v[ph1][0]),
                "polarization_V_at_5pw": float(
                    v[np.searchsorted(t, 2 * pw + 3 * pw)]),
                "max_true_residual": float(pr["residual"].max()),
            }
            pulse_rows.append(row)
            pol = row["polarization_V_at_5pw"]
            print(f"  [pulse {name}] peak |V| {row['peak_V']:.1f} V "
                  f"(static Z*I {row['static_ZI_V']:.1f} V), phase-1 "
                  f"creep {row['creep_V']:+.2f} V, residual "
                  f"polarization at 5*pw {pol:+.2f} V")
        print(f"  pulse synthesis: {n_solves} certified harmonic "
              f"solves in {time.perf_counter() - t0:.2f} s")
        save_results(pulse_rows, Path(args.outdir), stem="pulse")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for name, _ in states:
            sp = spectra[name]
            axes[0].loglog(freqs, sp["Z_abs"], marker="o", ms=3,
                           label=name)
            axes[1].semilogx(freqs, sp["Z_phase_deg"], marker="o",
                             ms=3, label=name)
        axes[0].set_ylabel("|Z| (ohm)")
        axes[1].set_ylabel("phase(Z) (deg)")
        for ax in axes:
            ax.set_xlabel("frequency (Hz)")
            ax.grid(alpha=0.3, which="both")
            ax.legend(title="contact state", fontsize=8)
        fig.suptitle("electrode impedance spectra (EQS, certified 1e-8)")
        fig.tight_layout()
        fp = Path(args.outdir) / "impedance_bode.png"
        fig.savefig(fp, dpi=150, bbox_inches="tight")
        print(f"  figure -> {fp}")

        if cem_spectra:
            fig, axes = plt.subplots(1, 2, figsize=(11, 4))
            for name, Z in cem_spectra.items():
                axes[0].loglog(freqs, np.abs(Z), marker="o", ms=3,
                               label=name)
                axes[1].semilogx(freqs, np.degrees(np.angle(Z)),
                                 marker="o", ms=3, label=name)
            axes[0].set_ylabel("|Z| (ohm)")
            axes[1].set_ylabel("phase(Z) (deg)")
            for ax in axes:
                ax.set_xlabel("frequency (Hz)")
                ax.grid(alpha=0.3, which="both")
                ax.legend(title="interface state", fontsize=8)
            fig.suptitle("CEM interface spectra (CPE boundary "
                         "impedance, certified complex solves)")
            fig.tight_layout()
            fp = Path(args.outdir) / "impedance_cem_bode.png"
            fig.savefig(fp, dpi=150, bbox_inches="tight")
            print(f"  figure -> {fp}")

        if pulses:
            stim = params["stim"]
            pw = stim["pulse_width_us"] * 1e-6
            fig, (ax_i, ax_v) = plt.subplots(
                2, 1, figsize=(8, 6), sharex=True,
                height_ratios=[1, 2.2])
            t, i, _ = next(iter(pulses.values()))
            win = t <= 6 * pw
            ax_i.plot(t[win] * 1e3, i[win] * 1e3, color="0.3", lw=1.2)
            ax_i.set_ylabel("I (mA)")
            for name, (t, _, v) in pulses.items():
                ax_v.plot(t[win] * 1e3, v[win], lw=1.4, label=name)
            ax_v.set_xlabel("time (ms)")
            ax_v.set_ylabel("electrode voltage (V)")
            ax_v.legend(title="contact state", fontsize=8)
            for ax in (ax_i, ax_v):
                ax.grid(alpha=0.3)
            fig.suptitle("biphasic pulse voltage transient "
                         "(Fourier-synthesized EQS steady state)")
            fig.tight_layout()
            fp = Path(args.outdir) / "pulse_voltage.png"
            fig.savefig(fp, dpi=150, bbox_inches="tight")
            print(f"  figure -> {fp}")


if __name__ == "__main__":
    main()
