"""Export tool tests: header structure, CLI flags, and an end-to-end
compile-and-run check — the generated C header is compiled with gcc and its
inline apply must match the library (and the reference's own exporter)."""

import ctypes
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg
from savgol_tpu.cli import main as cli_main
from savgol_tpu.utils.export import generate_header

F64 = jnp.float64


class TestHeaderStructure:
    def test_macros_and_tables_present(self):
        h = generate_header(sg.SavgolConfig(5, 2, 1), prefix="SAVGOL")
        assert "#define SAVGOL_HALF_WINDOW   5" in h
        assert "#define SAVGOL_POLY_ORDER    2" in h
        assert "#define SAVGOL_DERIVATIVE    1" in h
        assert "#define SAVGOL_WINDOW_SIZE   11" in h
        assert "static const float SAVGOL_CENTER_WEIGHTS[11]" in h
        assert "static const float SAVGOL_EDGE_WEIGHTS[5][11]" in h
        assert "static inline void SAVGOL_apply" in h
        assert "#ifndef SAVGOL_COEFFS_N5_M2_D1_H" in h

    def test_custom_prefix(self):
        h = generate_header(sg.SavgolConfig(3, 2), prefix="myfilt")
        assert "MYFILT_CENTER_WEIGHTS" in h
        assert "static inline void MYFILT_apply" in h

    def test_weight_values_in_header(self):
        cfg = sg.SavgolConfig(2, 2)
        h = generate_header(cfg)
        c, _ = sg.savgol_weights_np(cfg, dtype=np.float64)
        # the quadratic 5-point smoother has the classic -3/35 edge weight
        assert f"{np.float32(c[0]):+.10e}f" in h


class TestCLI:
    def test_stdout(self, capsys):
        rc = cli_main(["-n", "5", "-m", "2"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "SAVGOL_CENTER_WEIGHTS" in out

    def test_output_file(self, tmp_path, capsys):
        path = tmp_path / "coeffs.h"
        rc = cli_main(["-n", "4", "-m", "3", "-d", "1",
                       "-o", str(path), "-p", "DV"])
        assert rc == 0
        text = path.read_text()
        assert "DV_EDGE_WEIGHTS[4][9]" in text
        err = capsys.readouterr().err
        assert "Generated:" in err

    def test_invalid_config_fails(self, capsys):
        rc = cli_main(["-n", "0", "-m", "2"])
        assert rc == 1
        assert "Error" in capsys.readouterr().err

    def test_long_flags(self, capsys):
        rc = cli_main(["--half-window", "3", "--poly-order", "2",
                       "--derivative", "0", "--prefix", "LF"])
        assert rc == 0
        assert "LF_WINDOW_SIZE" in capsys.readouterr().out


class TestCompileAndRun:
    @pytest.mark.parametrize("n,m,d", [(5, 2, 0), (8, 3, 1)])
    def test_generated_header_executes(self, tmp_path, n, m, d):
        self._compile_and_compare(tmp_path, sg.SavgolConfig(n, m, d))

    def test_time_step_folded_into_tables(self, tmp_path):
        """time_step != 1 folds 1/dt^d into the emitted tables (review
        finding: the header used to emit unscaled weights, disagreeing
        with the library by 1/dt^d with nothing recording it) and emits a
        TIME_STEP macro."""
        cfg = sg.SavgolConfig(5, 3, 1, time_step=0.01)
        assert "GEN_TIME_STEP" in generate_header(cfg, prefix="GEN")
        self._compile_and_compare(tmp_path, cfg)

    def _compile_and_compare(self, tmp_path, cfg):
        """Compile the generated header's inline apply and compare against
        the library (reference edge sign, since the generated C applies the
        leading edge over reversed data like the reference)."""
        hdr = tmp_path / "coeffs.h"
        hdr.write_text(generate_header(cfg, prefix="GEN"))
        driver = tmp_path / "driver.c"
        driver.write_text(
            '#include "coeffs.h"\n'
            "void run(const float *in, float *out, int length) "
            "{ GEN_apply(in, out, length); }\n")
        so = tmp_path / "gen.so"
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", str(driver), "-o", str(so)],
            check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.run.argtypes = [ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        rng = np.random.default_rng(0)
        x = rng.standard_normal(200).astype(np.float32)
        out = np.empty_like(x)
        lib.run(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size)
        f = sg.Savgol1D.create(cfg, dtype=F64)
        ours = np.asarray(
            f.apply(jnp.asarray(x, dtype=F64), reference_edge_sign=True))
        scale = max(1.0, float(np.abs(ours).max()))
        assert np.abs(out - ours).max() <= 2e-6 * scale

    def test_matches_reference_exporter(self, tmp_path):
        """Our header's weight tables agree with the reference
        savgol_export tool's output to f32 print resolution."""
        ref_src = "/root/reference"
        exe = tmp_path / "ref_export"
        try:
            subprocess.run(
                ["gcc", "-O2", f"-I{ref_src}/include/iterative",
                 f"{ref_src}/src/savgol_export.c",
                 f"{ref_src}/src/savgolFilter.c", "-lm", "-o", str(exe)],
                check=True, capture_output=True)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"cannot build reference exporter: {e}")
        theirs = subprocess.run([str(exe), "-n", "5", "-m", "2"],
                                check=True, capture_output=True,
                                text=True).stdout
        ours = generate_header(sg.SavgolConfig(5, 2))

        def table(text, name):
            # extract all float literals after the table name
            import re
            block = text.split(name, 1)[1].split("};", 1)[0]
            return np.array([float(v) for v in
                             re.findall(r"[+-]\d\.\d+e[+-]\d+", block)],
                            dtype=np.float64)

        tc = table(theirs, "_CENTER_WEIGHTS")
        oc = table(ours, "_CENTER_WEIGHTS")
        assert tc.size == oc.size == 11
        np.testing.assert_allclose(oc, tc, atol=2e-7)
        te = table(theirs, "_EDGE_WEIGHTS")
        oe = table(ours, "_EDGE_WEIGHTS")
        assert te.size == oe.size == 55
        np.testing.assert_allclose(oe, te, atol=5e-7)
