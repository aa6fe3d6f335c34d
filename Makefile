# Convenience targets (see CLAUDE.md for environment notes)

.PHONY: test test-fast bench bench-train native clean-native lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

bench-train:
	INFODIFF_BENCH_MODE=train python bench.py

native:
	python -c "from infodiffusion_tpu.data.native import native_available; print('native:', native_available())"

clean-native:
	rm -rf native/build
