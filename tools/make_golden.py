"""Generate golden parity fixtures by executing the reference code headless.

Loads /root/reference/python_work/{droplet,PMA2_nk}.py with their module-level
plotting disabled (source-patched before exec), drives their operator chain on
deterministic inputs, and stores the results as .npz fixtures under
tests/fixtures/.  Run once per reference version; the test suite then checks
the TPU-native ops against these files without touching the reference.
"""
import pathlib

import numpy as np

REF = pathlib.Path("/root/reference/python_work")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"
OUT.mkdir(parents=True, exist_ok=True)


def load_patched(name: str, patches: dict):
    import matplotlib

    matplotlib.use("Agg")
    src = (REF / name).read_text()
    for old, new in patches.items():
        assert old in src, (name, old)
        src = src.replace(old, new)
    mod = {}
    mod["__name__"] = f"ref_{name[:-3]}"
    exec(compile(src, str(REF / name), "exec"), mod)
    return mod


def perturbation(ny, nx, scale):
    """Smooth deterministic perturbation vanishing at the boundary."""
    yy, xx = np.meshgrid(np.linspace(0, np.pi, ny), np.linspace(0, np.pi, nx),
                         indexing="ij")
    return scale * np.sin(xx) ** 2 * np.sin(yy) ** 2 * np.cos(2 * xx + 3 * yy)


def golden_droplet():
    d = load_patched("droplet.py", {"plot3d_bool = True": "plot3d_bool = False"})
    ny, nx = d["Ny_"], d["Nx_"]
    nn = d["NN_"]
    Q, U, M, Ibdy, P = d["Q"], d["U"], d["M"], d["Ibdy"], d["P"]

    Q.val = np.reshape(0.5 * d["ksiksi"] ** 2 + 0.5 * d["etaeta"] ** 2, nn)
    Q.val = Q.val + perturbation(ny, nx, 0.05).reshape(nn)
    d["make_Ibdy"]()
    d["make_M"]()

    # a droplet-ish positive solution field
    d["compute_Q_spatial_ders"]()
    jac = Q.d2ksi * Q.d2eta - Q.dksideta ** 2
    # set module global J (exec'd module dict)
    d["J"] = jac
    # module functions reference the global J; rebind via the module dict:
    # the exec'd functions read J from mod dict, so assignment above works.
    r2 = Q.dksi ** 2 + Q.deta ** 2
    U.val = d["epsilon_"] + np.exp(-1.5 * r2)
    U.new = U.val.copy()

    d["compute_u_spatial_ders"]()
    P.val = d["pressure"](U.val, U.xx, U.yy)
    d["compute_P_spatial_ders"]()
    F = d["pde_rhs"](U.val, U.xx, U.yy)
    mon = d["compute_and_smooth_monitor"]()
    d["solve_PMA"]()

    u_probe = U.val * (1 + 0.01 * np.cos(np.arange(nn) * 0.01))
    res = d["residual"](u_probe, F, 1e-4)

    lap_xx, lap_yy = d["Laplace_operator"](
        U.val.reshape(ny, nx),
        M.dksiCentre.dot(U.val),
        M.detaCentre.dot(U.val),
    )

    np.savez(
        OUT / "golden_droplet.npz",
        q=Q.val, u=U.val,
        q_dksi=Q.dksi, q_deta=Q.deta, q_d2ksi=Q.d2ksi, q_d2eta=Q.d2eta,
        q_dksideta=Q.dksideta, jac=jac,
        u_dx=U.dx, u_dy=U.dy, u_xx=U.xx, u_yy=U.yy,
        p_val=P.val, p_dx=P.dx, p_dy=P.dy,
        pde_rhs=F, monitor=mon, q_dt=Q.dt,
        u_probe=u_probe, residual=res,
        lap_raw_xx=lap_xx, lap_raw_yy=lap_yy,
        ny=ny, nx=nx,
        endl=d["endl_"], endr=d["endr_"], endb=d["endb_"], endt=d["endt_"],
        epsilon=d["epsilon_"], a=d["a_"], R=d["R_"], n_=d["n_"], m_=d["m_"],
        Bo=d["Bo_"], alpha2=d["alpha2_"], epsilon2=d["epsilon2_"],
        alpha=d["alpha_"], gamma=d["gamma_"], C=d["C_"],
    )
    print("droplet golden written")


def golden_pma2():
    d = load_patched("PMA2_nk.py", {"plot_bool = True": "plot_bool = False"})
    n = d["N_"]
    nn = d["NN_"]
    Q, U, M, Ibdy = d["Q"], d["U"], d["M"], d["Ibdy"]

    Q.val = np.reshape(0.5 * d["ksiksi"] ** 2 + 0.5 * d["etaeta"] ** 2, nn)
    Q.val = Q.val + perturbation(n, n, 0.02).reshape(nn)
    d["make_Ibdy"]()
    d["make_M"]()

    d["compute_Q_spatial_ders"]()
    jac = Q.d2ksi * Q.d2eta - Q.dksideta ** 2
    d["J"] = jac

    # MEMS-like negative field, zero at the boundary
    U.val = -0.35 * np.exp(-6 * (d["ksiksi"] ** 2 + d["etaeta"] ** 2)).reshape(nn)
    U.val[Ibdy.Boundary] = 0.0
    U.new = U.val.copy()

    d["compute_u_spatial_ders"]()
    mon = d["compute_and_smooth_monitor"]()
    d["solve_PMA"]()
    cn = d["compute_rhs_pde"]()
    d["CN_term"] = cn
    d["dt"] = 1e-4 * d["compute_g"]()

    u_probe = U.val + 0.01 * np.sin(np.arange(nn) * 0.05)
    res = d["residual"](u_probe)

    np.savez(
        OUT / "golden_pma2.npz",
        q=Q.val, u=U.val, jac=jac,
        q_dksi=Q.dksi, q_deta=Q.deta, q_d2ksi=Q.d2ksi, q_d2eta=Q.d2eta,
        q_dksideta=Q.dksideta,
        u_dx=U.dx, u_dy=U.dy, u_xx=U.xx, u_yy=U.yy,
        monitor=mon, q_dt=Q.dt, cn_term=cn, dt=d["dt"],
        u_probe=u_probe, residual=res, g=d["compute_g"](),
        n=n, p=d["p_"], m=d["m_"], beta=d["beta_"], lambd=d["lambd_"],
        epsilon=d["epsilon_"], alpha=d["alpha_"], gamma=d["gamma_"],
    )
    print("pma2 golden written")


def golden_droplet_step():
    """One full evolve_with_PDE step (scipy newton_krylov + short PMA loop)
    from the checked-in coalescence fixture — the end-to-end oracle."""
    from scipy.optimize import newton_krylov

    d = load_patched("droplet.py", {"plot3d_bool = True": "plot3d_bool = False"})
    d["epsilon_"] = 0.005  # fixture initdrop_coal_1_91-61_100_0.005_...
    ny, nx, nn = d["Ny_"], d["Nx_"], d["NN_"]
    Q, U, P = d["Q"], d["U"], d["P"]

    fix = np.loadtxt(REF / "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")
    U.val = fix[:, 0].copy()
    U.new = U.val.copy()
    Q.val = fix[:, 1].copy()
    d["make_Ibdy"]()
    d["make_M"]()

    dt_n = 1e-5  # dt where the scipy oracle converges cleanly (3 Newton iters)
    d["compute_Q_spatial_ders"]()
    d["J"] = Q.d2ksi * Q.d2eta - Q.dksideta ** 2
    d["compute_u_spatial_ders"]()
    P.val = d["pressure"](U.val, U.xx, U.yy)
    d["compute_P_spatial_ders"]()
    F = d["pde_rhs"](U.val, U.xx, U.yy)
    u_new = newton_krylov(lambda u: d["residual"](u, F, dt_n), U.val,
                          maxiter=20, f_tol=1e-7)
    d["loop_pma"](3e-9, 5)  # shortened sub-loop for test runtime
    min_spc = d["get_minimum_spacings"]().min()

    np.savez(
        OUT / "golden_droplet_step.npz",
        u_old=fix[:, 0], q_old=fix[:, 1],
        F=F, u_new=u_new, q_new=Q.val, dt=dt_n,
        min_spacing=min_spc, ny=ny, nx=nx,
    )
    print("droplet full-step golden written")


def golden_rect_step():
    """One evolve step from a rect (single-droplet) fixture — BASELINE
    config 3 ("PMA thin-film droplet, rect init 61x61 grid")."""
    from scipy.optimize import newton_krylov

    d = load_patched("droplet.py", {"plot3d_bool = True": "plot3d_bool = False"})
    # fixture initdrop_rect_1_61-61_100_0.01_... matches the default eps=0.01
    d["Nx_"] = d["Ny_"] = 61
    d["NN_"] = 61 * 61
    # grid-dependent globals must be rebuilt for the 61x61 grid
    d["ksiksi"], d["etaeta"] = np.meshgrid(
        np.linspace(d["endl_"], d["endr_"], 61),
        np.linspace(d["endb_"], d["endt_"], 61),
    )
    d["dksi_"] = (d["endr_"] - d["endl_"]) / 60
    d["deta_"] = (d["endt_"] - d["endb_"]) / 60
    d["dksi2_"] = d["dksi_"] ** 2
    d["deta2_"] = d["deta_"] ** 2
    Q, U, P = d["Q"], d["U"], d["P"]

    fix = np.loadtxt(REF / "initdrop_rect_1_61-61_100_0.01_0.01_0.1_0.15.txt")
    U.val = fix[:, 0].copy()
    U.new = U.val.copy()
    Q.val = fix[:, 1].copy()
    d["make_Ibdy"]()
    d["make_M"]()

    dt_n = 1e-5
    d["compute_Q_spatial_ders"]()
    d["J"] = Q.d2ksi * Q.d2eta - Q.dksideta ** 2
    d["compute_u_spatial_ders"]()
    P.val = d["pressure"](U.val, U.xx, U.yy)
    d["compute_P_spatial_ders"]()
    F = d["pde_rhs"](U.val, U.xx, U.yy)
    u_new = newton_krylov(lambda u: d["residual"](u, F, dt_n), U.val,
                          maxiter=20, f_tol=1e-7)
    d["loop_pma"](3e-9, 5)
    np.savez(
        OUT / "golden_rect_step.npz",
        u_old=fix[:, 0], q_old=fix[:, 1], F=F, u_new=u_new, q_new=Q.val,
        dt=dt_n,
    )
    print("rect full-step golden written")


def golden_droplet_trajectory():
    """Six steps of evolve_with_PDE's actual loop (droplet.py:360-411:
    dt_n = dt*scale with the lagged scale law, JFNK at f_tol=1e-7, PMA
    sub-loop driven by the *old* solution) from the coalescence fixture at
    dt=1e-5 — gates evolve()'s step/scale/PMA interleaving end-to-end."""
    from scipy.optimize import newton_krylov

    d = load_patched("droplet.py", {"plot3d_bool = True": "plot3d_bool = False"})
    d["epsilon_"] = 0.005
    Q, U, P = d["Q"], d["U"], d["P"]

    fix = np.loadtxt(REF / "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")
    U.new = fix[:, 0].copy()
    Q.val = fix[:, 1].copy()
    d["make_Ibdy"]()
    d["make_M"]()

    dt, dtmesh, pmaloops, nsteps = 1e-5, 3e-9, 5, 6
    scale = 1.0
    dts, u_traj, q_traj = [], [], []
    for _ in range(nsteps):
        dt_n = dt * scale
        U.val = U.new.copy()
        d["compute_Q_spatial_ders"]()
        d["J"] = Q.d2ksi * Q.d2eta - Q.dksideta ** 2
        d["compute_u_spatial_ders"]()
        P.val = d["pressure"](U.val, U.xx, U.yy)
        d["compute_P_spatial_ders"]()
        F = d["pde_rhs"](U.val, U.xx, U.yy)
        U.new = newton_krylov(lambda u: d["residual"](u, F, dt_n), U.val,
                              maxiter=20, f_tol=1e-7)
        d["loop_pma"](dtmesh, pmaloops)
        dts.append(dt_n)
        u_traj.append(U.new.copy())
        q_traj.append(Q.val.copy())
        scale += np.exp(-10 * np.linalg.norm(U.new - U.val))

    np.savez(
        OUT / "golden_droplet_traj.npz",
        u0=fix[:, 0], q0=fix[:, 1], dt=dt, dtmesh=dtmesh,
        pmaloops=pmaloops, dts=np.asarray(dts),
        u_traj=np.asarray(u_traj), q_traj=np.asarray(q_traj),
    )
    print("droplet trajectory golden written")


def golden_pma2_trajectory():
    """Three steps of PMA2_nk.py's actual main loop (operator-split CN/JFNK
    + explicit mesh update) from the zero initial state."""
    from scipy.optimize import newton_krylov

    d = load_patched("PMA2_nk.py", {"plot_bool = True": "plot_bool = False"})
    n, nn = d["N_"], d["NN_"]
    Q, U = d["Q"], d["U"]
    Q.val = np.reshape(0.5 * d["ksiksi"] ** 2 + 0.5 * d["etaeta"] ** 2, nn)
    d["make_Ibdy"]()
    d["make_M"]()
    U.new = np.zeros(nn)

    dts = []
    for s in range(3):
        U.val = U.new.copy()
        d["compute_Q_spatial_ders"]()
        d["J"] = Q.d2ksi * Q.d2eta - Q.dksideta ** 2
        d["compute_u_spatial_ders"]()
        d["dt"] = d["compute_g"]() * d["k"]
        d["solve_PMA"]()
        d["CN_term"] = d["compute_rhs_pde"]()
        U.new = newton_krylov(d["residual"], U.val, verbose=0)
        Q.val = Q.val + d["dt"] * Q.dt
        dts.append(d["dt"])

    np.savez(
        OUT / "golden_pma2_traj.npz",
        u=U.new, q=Q.val, dts=np.asarray(dts), n=n, k=d["k"],
    )
    print("pma2 trajectory golden written")


if __name__ == "__main__":
    golden_droplet()
    golden_pma2()
    golden_droplet_step()
    golden_rect_step()
    golden_pma2_trajectory()
