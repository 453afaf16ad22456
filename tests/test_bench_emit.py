"""bench.py artifact-format guard.

The driver records only the TAIL of bench stdout; round 3's single giant
JSON line (inline notes + stage breakdown) got head-truncated and the round's
metrics were lost (ADVICE.md r3). These tests pin the contract that fixes it:
the final stdout line is compact (parses alone, hard size cap, every metric
present) and the full prose-bearing result lands in BENCH_FULL.json.
"""

import json
import subprocess
import sys

sys.path.insert(0, '/root/repo')
import bench  # noqa: E402


def _fat_result():
    """A result shaped like a real round, with long notes everywhere."""
    note = 'x' * 400
    return {
        'metric': 'chair_480p_device_fps', 'value': 182.0,
        'unit': 'frames/sec', 'vs_baseline': 6.07,
        'extra_metrics': [
            {'metric': f'realistically_long_metric_name_{i:02d}',
             'value': float(i), 'unit': 'frames/sec',
             'vs_baseline': 1.0, 'note': note} for i in range(14)
        ],
        'timing_method': note,
        'frame_gflops': 255.85,
        'mfu_pct': 25.6,
        'stage_breakdown_ms': {'key_encode': 2.1, 'memory_readout': 2.9,
                               'full_frame': 4.2, 'note': note},
        'perf_note': note,
    }


class TestBenchEmit:
    def test_last_stdout_line_is_compact_and_complete(self, tmp_path, capsys,
                                                      monkeypatch):
        full_path = tmp_path / 'BENCH_FULL.json'
        monkeypatch.setenv('XMEM2_BENCH_FULL', str(full_path))
        result = _fat_result()
        bench.emit(result)
        out = capsys.readouterr().out
        last = out.strip().splitlines()[-1]

        parsed = json.loads(last)
        # every metric survives with its value; prose does not
        assert parsed['metric'] == 'chair_480p_device_fps'
        assert parsed['value'] == 182.0
        names = [m['metric'] for m in parsed['extra_metrics']]
        assert names == [m['metric'] for m in result['extra_metrics']]
        assert all('note' not in m for m in parsed['extra_metrics'])
        assert 'perf_note' not in parsed
        assert parsed['mfu_pct'] == 25.6
        # hard cap: the driver's tail capture held >=2000 chars in r03; stay
        # comfortably below so head-truncation cannot recur even with more
        # metrics added later
        assert len(last) < 1900, len(last)

    def test_full_json_written_with_prose(self, tmp_path, capsys, monkeypatch):
        full_path = tmp_path / 'BENCH_FULL.json'
        monkeypatch.setenv('XMEM2_BENCH_FULL', str(full_path))
        bench.emit(_fat_result())
        capsys.readouterr()
        full = json.loads(full_path.read_text())
        assert full['perf_note'].startswith('x')
        assert full['stage_breakdown_ms']['memory_readout'] == 2.9
        assert all('note' in m for m in full['extra_metrics'])

    def test_emit_survives_unwritable_path(self, tmp_path, capsys,
                                           monkeypatch):
        monkeypatch.setenv('XMEM2_BENCH_FULL',
                           str(tmp_path / 'nodir' / 'BENCH_FULL.json'))
        bench.emit(_fat_result())   # must not raise
        out = capsys.readouterr().out
        assert json.loads(out.strip().splitlines()[-1])['value'] == 182.0
