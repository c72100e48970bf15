# Development entry points (analog of the reference's Makefile targets).

PY ?= python

.PHONY: all native test test_all samples bench stubs clean

all: native test

native:
	$(PY) -c "from videoprocessingframework_tpu.io import build; print(build.build())"

test:
	$(PY) -m pytest tests/ -x -q

test_all:
	$(PY) -m pytest tests/ -q -m ""

samples:
	$(PY) samples/sample_decode.py
	$(PY) samples/sample_decode_sw.py
	$(PY) samples/sample_demux_decode.py
	$(PY) samples/sample_transcode.py
	$(PY) samples/sample_remap.py --frames 2
	$(PY) samples/sample_dlpack.py
	$(PY) samples/sample_measure_video_quality.py --frames 16
	$(PY) samples/sample_decode_multi_thread.py --streams 2

bench:
	$(PY) bench.py

bench_quick:
	$(PY) bench.py --quick

clean:
	rm -rf videoprocessingframework_tpu/io/_native_build .bench
	find . -name __pycache__ -type d -exec rm -rf {} +
