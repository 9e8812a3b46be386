"""Interactive Tk GUI — capability parity with the reference's 8-tab shell.

Mirrors `JacketAnalysisGUI` (`/root/reference/JacketAnalysisGUI_v2.py:809-2260`):
the same tab set (Node Geometry / Members / Material & Sections / Wave
Parameters / Loads / Run Analysis / Results / Info & Assumptions), node and
member CRUD with fixed/top toggles, leg and horizontal-brace auto-generation,
default geometry + storm parameters, a RUN button streaming the analysis log,
a 3D utilization plot and CSV export — plus JSON model save/load, which the
reference GUI implies but lacks (SURVEY.md section 5).

The GUI is a thin widget layer: every computation delegates to the tested
engine (`models`, `ops`, `api`, `utils`), so it needs no physics of its own.
Launch:  python -m small_fem_solver_tpu.gui
"""
from __future__ import annotations

import tkinter as tk
from tkinter import filedialog, messagebox, ttk

import numpy as np

INFO_TEXT = """\
COORDINATE SYSTEM
  X-axis: EAST (+X = East)      Y-axis: NORTH (+Y = North)
  Z-axis: UP, Z = 0 at Mean Water Level (MWL)

UNITS
  input: geometry m, sections mm, loads kN / kNm, wave m/s
  internal: mm / N / N*mm (stresses MPa); hydrodynamics SI

THEORY
  - Wave kinematics: Airy, Stokes 5th (Fenton 1985), Fenton stream
    function (Rienecker-Fenton collocation); automatic selection by
    steepness H/L: <0.01 Airy, <0.03 Stokes-3, <0.06 Stokes-5, else
    stream function N=10..20.
  - Morison equation per member: F = 0.5 rho Cd D |U_perp| U_perp
    + rho Cm (pi D^2/4) A_perp, 15-point Gauss quadrature, lever-rule
    nodal distribution. Slender-member assumption D/L < 0.2.
  - 3D Timoshenko beam FEM (12-DOF elements, shear areas 0.5 A), linear
    static solve, von Mises checked at 8 circumferential points.

VALIDITY LIMITS (checked, reported as warnings)
  - thin-wall sections: D/t > 10
  - breaking waves: H/L < 0.142 (deep), H/d < 0.78 (shallow)

EXCLUDED (as in the reference tool)
  buckling, P-delta, dynamics, fatigue, soil-structure interaction
"""


class JacketGUI:
    def __init__(self, root):
        self.root = root
        root.title("TPU-Native Jacket Structural Analysis")
        root.geometry("1500x950")

        self.nodes_data: dict[str, list] = {}
        self.members_data: list[dict] = []
        self.fixed_nodes: list[str] = []
        self.top_nodes: list[str] = []
        self.analysis_results = None
        self.analysis_model = None

        nb = ttk.Notebook(root)
        nb.pack(fill=tk.BOTH, expand=True, padx=5, pady=5)
        self.tabs = {}
        for name in ["1. Node Geometry", "2. Members", "3. Material & Sections",
                     "4. Wave Parameters", "5. Loads", "6. Run Analysis",
                     "7. Results", "8. Info & Assumptions"]:
            f = ttk.Frame(nb)
            nb.add(f, text=name)
            self.tabs[name] = f

        self._build_geometry_tab()
        self._build_members_tab()
        self._build_material_tab()
        self._build_wave_tab()
        self._build_loads_tab()
        self._build_analysis_tab()
        self._build_results_tab()
        self._build_info_tab()

        self.load_default_geometry()
        self.load_default_params()

    # ------------------------------------------------------------- geometry
    def _build_geometry_tab(self):
        f = self.tabs["1. Node Geometry"]
        entry = ttk.Frame(f)
        entry.pack(fill=tk.X, padx=5, pady=5)
        self.node_entries = {}
        for col, key in enumerate(["Name", "X", "Y", "Z"]):
            ttk.Label(entry, text=key + ":").grid(row=0, column=2 * col)
            e = ttk.Entry(entry, width=10)
            e.grid(row=0, column=2 * col + 1, padx=2)
            self.node_entries[key.lower()] = e
        ttk.Button(entry, text="Add Node", command=self.add_node).grid(
            row=0, column=8, padx=4)
        ttk.Button(entry, text="Delete Selected",
                   command=self.delete_node).grid(row=0, column=9, padx=4)

        cols = ("name", "x", "y", "z", "fixed", "top")
        self.node_tree = ttk.Treeview(f, columns=cols, show="headings",
                                      height=18)
        for c in cols:
            self.node_tree.heading(c, text=c.upper())
            self.node_tree.column(c, width=90)
        self.node_tree.pack(fill=tk.BOTH, expand=True, padx=5, pady=5)

        btns = ttk.Frame(f)
        btns.pack(fill=tk.X, padx=5, pady=5)
        for text, cmd in [("Toggle Fixed (Support)", self.toggle_fixed),
                          ("Toggle Top (Interface)", self.toggle_top),
                          ("Load Default Geometry", self.load_default_geometry),
                          ("Clear All", self.clear_geometry),
                          ("3D Preview", self.preview_3d),
                          ("Save Model JSON...", self.save_model_json),
                          ("Load Model JSON...", self.load_model_json)]:
            ttk.Button(btns, text=text, command=cmd).pack(side=tk.LEFT, padx=4)

    def add_node(self):
        name = self.node_entries["name"].get().strip().upper()
        try:
            xyz = [float(self.node_entries[k].get()) for k in "xyz"]
        except ValueError:
            messagebox.showerror("Error", "Invalid coordinate values")
            return
        if not name:
            messagebox.showerror("Error", "Node name cannot be empty")
            return
        self.nodes_data[name] = xyz
        self.refresh_nodes()

    def delete_node(self):
        for item in self.node_tree.selection():
            name = self.node_tree.item(item)["values"][0]
            self.nodes_data.pop(name, None)
            for lst in (self.fixed_nodes, self.top_nodes):
                if name in lst:
                    lst.remove(name)
        self.refresh_nodes()

    def _toggle(self, lst):
        for item in self.node_tree.selection():
            name = self.node_tree.item(item)["values"][0]
            if name in lst:
                lst.remove(name)
            else:
                lst.append(name)
        self.refresh_nodes()

    def toggle_fixed(self):
        self._toggle(self.fixed_nodes)

    def toggle_top(self):
        self._toggle(self.top_nodes)

    def refresh_nodes(self):
        self.node_tree.delete(*self.node_tree.get_children())
        for name, c in sorted(self.nodes_data.items()):
            self.node_tree.insert("", tk.END, values=(
                name, f"{c[0]:.3f}", f"{c[1]:.3f}", f"{c[2]:.3f}",
                "x" if name in self.fixed_nodes else "",
                "x" if name in self.top_nodes else ""))

    def clear_geometry(self):
        if messagebox.askyesno("Confirm", "Clear all geometry data?"):
            self.nodes_data, self.members_data = {}, []
            self.fixed_nodes, self.top_nodes = [], []
            self.refresh_nodes()
            self.refresh_members()

    def load_default_geometry(self):
        from .models.presets import default_3leg_jacket_geometry
        nodes, members, fixed, top = default_3leg_jacket_geometry(47.0)
        self.nodes_data = {k: list(v) for k, v in nodes.items()}
        self.members_data = list(members)
        self.fixed_nodes, self.top_nodes = list(fixed), list(top)
        self.refresh_nodes()
        self.refresh_members()

    def preview_3d(self):
        if not self.nodes_data:
            messagebox.showwarning("Warning", "No nodes defined!")
            return
        import matplotlib
        matplotlib.use("TkAgg")
        import matplotlib.pyplot as plt
        from .utils.plotting import _draw_structure
        model = self._build_model()
        fig = plt.figure(figsize=(10, 9))
        ax = fig.add_subplot(111, projection="3d")
        _draw_structure(ax, model)
        plt.show()

    def save_model_json(self):
        path = filedialog.asksaveasfilename(defaultextension=".json")
        if path:
            from .utils.io import save_model
            save_model(path, self._build_model(), params=self._params())
            messagebox.showinfo("Saved", f"Model written to {path}")

    def load_model_json(self):
        path = filedialog.askopenfilename(filetypes=[("JSON", "*.json")])
        if not path:
            return
        import json
        d = json.loads(open(path).read())
        self.nodes_data = {k: list(v) for k, v in d["nodes"].items()}
        self.members_data = d["members"]
        self.fixed_nodes = d.get("fixed_nodes", [])
        self.top_nodes = d.get("top_nodes", [])
        self.refresh_nodes()
        self.refresh_members()

    # -------------------------------------------------------------- members
    def _build_members_tab(self):
        f = self.tabs["2. Members"]
        entry = ttk.Frame(f)
        entry.pack(fill=tk.X, padx=5, pady=5)
        self.member_entries = {}
        for col, key in enumerate(["Name", "Node 1", "Node 2"]):
            ttk.Label(entry, text=key + ":").grid(row=0, column=2 * col)
            e = ttk.Entry(entry, width=12)
            e.grid(row=0, column=2 * col + 1, padx=2)
            self.member_entries[key.lower().replace(" ", "")] = e
        ttk.Label(entry, text="Type:").grid(row=0, column=6)
        self.member_type = tk.StringVar(value="brace")
        ttk.Combobox(entry, textvariable=self.member_type, width=9,
                     values=["leg", "h_brace", "x_brace", "brace"]).grid(
            row=0, column=7, padx=2)
        ttk.Button(entry, text="Add Member", command=self.add_member).grid(
            row=0, column=8, padx=4)
        ttk.Button(entry, text="Delete Selected",
                   command=self.delete_member).grid(row=0, column=9, padx=4)

        cols = ("name", "node1", "node2", "type")
        self.member_tree = ttk.Treeview(f, columns=cols, show="headings",
                                        height=20)
        for c in cols:
            self.member_tree.heading(c, text=c.upper())
            self.member_tree.column(c, width=150)
        self.member_tree.pack(fill=tk.BOTH, expand=True, padx=5, pady=5)

        btns = ttk.Frame(f)
        btns.pack(fill=tk.X, padx=5, pady=5)
        ttk.Label(btns, text="Auto-generate:").pack(side=tk.LEFT, padx=4)
        ttk.Button(btns, text="Legs (A1-A2-A3...)",
                   command=self.autogen_legs).pack(side=tk.LEFT, padx=4)
        ttk.Button(btns, text="Horizontal Braces",
                   command=self.autogen_h).pack(side=tk.LEFT, padx=4)

    def add_member(self):
        name = self.member_entries["name"].get().strip()
        n1 = self.member_entries["node1"].get().strip().upper()
        n2 = self.member_entries["node2"].get().strip().upper()
        if not all([name, n1, n2]):
            messagebox.showerror("Error", "All fields are required")
            return
        if n1 not in self.nodes_data or n2 not in self.nodes_data:
            messagebox.showerror("Error", f"Nodes {n1} or {n2} not defined")
            return
        self.members_data.append({"name": name, "node1": n1, "node2": n2,
                                  "type": self.member_type.get()})
        self.refresh_members()

    def delete_member(self):
        names = {self.member_tree.item(i)["values"][0]
                 for i in self.member_tree.selection()}
        self.members_data = [m for m in self.members_data
                             if m["name"] not in names]
        self.refresh_members()

    def refresh_members(self):
        self.member_tree.delete(*self.member_tree.get_children())
        for m in self.members_data:
            self.member_tree.insert("", tk.END, values=(
                m["name"], m["node1"], m["node2"], m["type"]))

    def autogen_legs(self):
        from .models.autogen import auto_generate_legs
        auto_generate_legs(self.nodes_data, self.members_data)
        self.refresh_members()

    def autogen_h(self):
        from .models.autogen import auto_generate_h_braces
        auto_generate_h_braces(self.nodes_data, self.members_data)
        self.refresh_members()

    # ---------------------------------------------- material / wave / loads
    def _entry_grid(self, frame, rows):
        entries = {}
        for r, (label, key, default, unit) in enumerate(rows):
            ttk.Label(frame, text=label).grid(row=r, column=0, sticky="e",
                                              padx=5, pady=2)
            e = ttk.Entry(frame, width=12)
            e.insert(0, default)
            e.grid(row=r, column=1, padx=5)
            ttk.Label(frame, text=unit).grid(row=r, column=2, sticky="w")
            entries[key] = e
        return entries

    def _build_material_tab(self):
        f = ttk.Frame(self.tabs["3. Material & Sections"], padding=10)
        f.pack(fill=tk.BOTH)
        self.mat = self._entry_grid(f, [
            ("Young's Modulus (E):", "E", "210000", "N/mm2 (MPa)"),
            ("Poisson's Ratio (nu):", "nu", "0.3", ""),
            ("Yield Strength (fy):", "fy", "355", "MPa"),
            ("Steel Density:", "rho_steel", "7850", "kg/m3"),
            ("Water Density:", "rho_water", "1025", "kg/m3"),
            ("Leg D:", "D_leg", "2000", "mm"),
            ("Leg t:", "t_leg", "75", "mm"),
            ("Brace D:", "D_brace", "800", "mm"),
            ("Brace t:", "t_brace", "30", "mm"),
        ])

    def _build_wave_tab(self):
        f = ttk.Frame(self.tabs["4. Wave Parameters"], padding=10)
        f.pack(fill=tk.BOTH)
        self.wav = self._entry_grid(f, [
            ("Wave Height (H):", "H", "17.038", "m"),
            ("Period (T):", "T", "9.4", "s"),
            ("Water Depth (d):", "d", "50.0", "m"),
            ("Current Speed (Uc):", "Uc", "1.7", "m/s"),
            ("Wave Direction:", "wave_dir", "38.0", "deg from North (cw)"),
            ("Current Direction:", "current_dir", "38.0", "deg from North (cw)"),
            ("Harmonics (N):", "N", "10", ""),
            ("Drag Coeff (Cd):", "Cd", "0.7", ""),
            ("Inertia Coeff (Cm):", "Cm", "2.0", ""),
        ])
        ttk.Label(f, text="Wave Model:").grid(row=9, column=0, sticky="e",
                                              padx=5)
        self.wave_model = tk.StringVar(value="auto")
        ttk.Combobox(f, textvariable=self.wave_model, width=10,
                     values=["auto", "fenton", "stokes", "airy"]).grid(
            row=9, column=1)
        self.do_phase_scan = tk.BooleanVar(value=True)
        ttk.Checkbutton(f, text="Scan wave period for critical phase",
                        variable=self.do_phase_scan).grid(
            row=10, column=0, columnspan=2, pady=4)

    def _build_loads_tab(self):
        f = ttk.Frame(self.tabs["5. Loads"], padding=10)
        f.pack(fill=tk.BOTH)
        self.lds = self._entry_grid(f, [
            ("Topside Axial:", "F_axial", "25100", "kN (compression)"),
            ("Topside Shear:", "F_shear", "2900", "kN (along wave dir)"),
            ("Overturning Moment:", "M_moment", "0", "kNm"),
            ("Torsional Moment:", "M_torsion", "0", "kNm"),
            ("Custom Self-weight:", "custom_sw", "1100", "tonnes"),
        ])
        self.sw_mode = tk.StringVar(value="custom")
        for r, (label, val) in enumerate([
                ("Calculated from member masses", "calculated"),
                ("Custom total (tonnes above)", "custom"),
                ("Exclude self-weight", "none")]):
            ttk.Radiobutton(f, text=label, variable=self.sw_mode,
                            value=val).grid(row=5 + r, column=0, columnspan=2,
                                            sticky="w")

    # ------------------------------------------------------------- analysis
    def _build_analysis_tab(self):
        f = self.tabs["6. Run Analysis"]
        top = ttk.Frame(f, padding=5)
        top.pack(fill=tk.X)
        ttk.Label(top, text="Analysis time t:").pack(side=tk.LEFT)
        self.entry_t = ttk.Entry(top, width=8)
        self.entry_t.insert(0, "0.0")
        self.entry_t.pack(side=tk.LEFT, padx=4)
        ttk.Label(top, text="s").pack(side=tk.LEFT)
        ttk.Button(top, text="RUN ANALYSIS",
                   command=self.run_analysis).pack(side=tk.LEFT, padx=20)
        self.log_text = tk.Text(f, font=("Consolas", 9))
        self.log_text.pack(fill=tk.BOTH, expand=True, padx=5, pady=5)

    def log(self, msg):
        self.log_text.insert(tk.END, msg + "\n")
        self.log_text.see(tk.END)
        self.root.update()

    def _params(self) -> dict:
        g = lambda e: float(e.get())
        return dict(
            E=g(self.mat["E"]), nu=g(self.mat["nu"]), fy=g(self.mat["fy"]),
            rho_steel=g(self.mat["rho_steel"]),
            rho_water=g(self.mat["rho_water"]),
            D_leg=g(self.mat["D_leg"]), t_leg=g(self.mat["t_leg"]),
            D_brace=g(self.mat["D_brace"]), t_brace=g(self.mat["t_brace"]),
            H=g(self.wav["H"]), T=g(self.wav["T"]), d=g(self.wav["d"]),
            Uc=g(self.wav["Uc"]), wave_dir=g(self.wav["wave_dir"]),
            current_dir=g(self.wav["current_dir"]),
            N=int(float(self.wav["N"].get())),
            Cd=g(self.wav["Cd"]), Cm=g(self.wav["Cm"]),
            wave_model=self.wave_model.get(),
            F_axial=g(self.lds["F_axial"]), F_shear=g(self.lds["F_shear"]),
            M_moment=g(self.lds["M_moment"]),
            M_torsion=g(self.lds["M_torsion"]),
            custom_sw=g(self.lds["custom_sw"]), sw_mode=self.sw_mode.get(),
            t_analysis=float(self.entry_t.get()),
        )

    def _build_model(self, p=None):
        from .models.model import build_model
        p = p or self._params()
        return build_model(self.nodes_data, self.members_data,
                           self.fixed_nodes, self.top_nodes,
                           leg_section=(p["D_leg"], p["t_leg"]),
                           brace_section=(p["D_brace"], p["t_brace"]),
                           rho_steel=p["rho_steel"])

    def run_analysis(self):
        self.log_text.delete("1.0", tk.END)
        try:
            import jax
            jax.config.update("jax_enable_x64", True)
            from . import LoadCase, analyze, make_wave, phase_scan, validate_wave
            from .utils.report import render_report

            p = self._params()
            for msg in validate_wave(p["H"], p["T"], p["d"]):
                self.log(f"WARNING: {msg}")
            model = self._build_model(p)
            self.log(f"Building wave model ({p['wave_model']})...")
            wave = make_wave(p["H"], p["T"], p["d"], p["Uc"],
                             model=p["wave_model"], N=p["N"])
            case = LoadCase(
                E=p["E"], nu=p["nu"], fy=p["fy"], rho_water=p["rho_water"],
                wave_dir_deg=p["wave_dir"], current_dir_deg=p["current_dir"],
                Cd=p["Cd"], Cm=p["Cm"], F_axial_kN=p["F_axial"],
                F_shear_kN=p["F_shear"], M_moment_kNm=p["M_moment"],
                M_torsion_kNm=p["M_torsion"], custom_sw_tonnes=p["custom_sw"],
                t_analysis=p["t_analysis"], sw_mode=p["sw_mode"])

            scan = None
            if self.do_phase_scan.get():
                self.log("Scanning wave period for critical phase...")
                D_m = model.sections.D_outer[model.sect_id] / 1000.0
                scan = phase_scan(wave, model.coords, model.conn, D_m,
                                  case.wave_dir_deg, case.current_dir_deg,
                                  case.Cd, case.Cm, case.rho_water,
                                  n_steps=36)

            self.log("Solving (first run compiles the XLA program)...")
            res = analyze(model, wave, case, solver="chol")
            self.log(render_report(model, wave, case, res, phase_scan=scan))
            self.analysis_results = res
            self.analysis_model = model
            self.analysis_case = case
            util = float(np.asarray(res.utilization).max())
            messagebox.showinfo(
                "Complete",
                f"Analysis complete!\n\nWave model: {wave.model_info()}\n"
                f"Max utilization: {util:.2%}")
        except Exception as e:
            import traceback
            self.log(f"\nERROR: {e}")
            self.log(traceback.format_exc())
            messagebox.showerror("Error", str(e))

    # -------------------------------------------------------------- results
    def _build_results_tab(self):
        f = self.tabs["7. Results"]
        btns = ttk.Frame(f, padding=5)
        btns.pack(fill=tk.X)
        ttk.Button(btns, text="Show Summary",
                   command=self.show_summary).pack(side=tk.LEFT, padx=4)
        ttk.Button(btns, text="3D Utilization Plot",
                   command=self.plot_results).pack(side=tk.LEFT, padx=4)
        ttk.Button(btns, text="Export CSV...",
                   command=self.export_csv).pack(side=tk.LEFT, padx=4)
        self.results_text = tk.Text(f, font=("Consolas", 9))
        self.results_text.pack(fill=tk.BOTH, expand=True, padx=5, pady=5)

    def show_summary(self):
        if self.analysis_results is None:
            messagebox.showwarning("Warning", "Run analysis first!")
            return
        from .utils.io import member_force_table
        self.results_text.delete("1.0", tk.END)
        for m in member_force_table(self.analysis_model,
                                    self.analysis_results):
            self.results_text.insert(tk.END, (
                f"{m['member']}: Fx={m['Fx_max_kN']:.1f}kN, "
                f"VM={m['von_mises_max_MPa']:.1f}MPa, "
                f"Util={m['utilization']:.2%}\n"))

    def plot_results(self):
        if self.analysis_results is None:
            messagebox.showwarning("Warning", "Run analysis first!")
            return
        import matplotlib
        matplotlib.use("TkAgg")
        import matplotlib.pyplot as plt
        from .utils.plotting import _draw_structure, _util_color
        util = np.asarray(self.analysis_results.utilization)
        fig = plt.figure(figsize=(11, 10))
        ax = fig.add_subplot(111, projection="3d")
        _draw_structure(ax, self.analysis_model,
                        member_colors=[_util_color(u) for u in util])
        ax.set_title(f"Max utilization {util.max():.1%}")
        plt.show()

    def export_csv(self):
        if self.analysis_results is None:
            messagebox.showwarning("Warning", "Run analysis first!")
            return
        path = filedialog.asksaveasfilename(defaultextension=".csv",
                                            filetypes=[("CSV", "*.csv")])
        if path:
            from .utils.io import export_csv
            export_csv(path, self.analysis_model, self.analysis_results)
            messagebox.showinfo("Exported", f"Saved to {path}")

    # ----------------------------------------------------------------- info
    def _build_info_tab(self):
        t = tk.Text(self.tabs["8. Info & Assumptions"], font=("Consolas", 9))
        t.insert("1.0", INFO_TEXT)
        t.configure(state="disabled")
        t.pack(fill=tk.BOTH, expand=True, padx=5, pady=5)

    def load_default_params(self):
        pass  # defaults are pre-filled in the entry constructors


def main():
    root = tk.Tk()
    root.update_idletasks()
    w, h = 1500, 950
    x = (root.winfo_screenwidth() - w) // 2
    y = (root.winfo_screenheight() - h) // 2
    root.geometry(f"{w}x{h}+{x}+{y}")
    JacketGUI(root)
    root.mainloop()


if __name__ == "__main__":
    main()
