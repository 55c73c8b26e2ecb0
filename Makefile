# kanter_core_tpu developer entry points
.PHONY: test bench soak parity demo native clean

test:
	python -m pytest tests/ -q

bench:  ## runs on the default backend (the real TPU under axon)
	python bench.py

soak:   ## randomized interactive edits vs compiled ground truth
	python scripts/soak.py 120 0

parity: ## golden battery on the current backend
	python scripts/tpu_parity.py

demo:   ## run all self-contained examples
	python examples/interactive_editing.py
	python examples/batch_sharded.py
	python examples/memory_tiering.py
	python examples/fit_texture.py

native: ## force-rebuild the C++ host kernels
	g++ -O3 -march=native -shared -fPIC -o native/_kanter_native.so native/kanter_native.cpp

clean:
	rm -rf native/_kanter_native.so **/__pycache__ .pytest_cache
