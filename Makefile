# Round-close artifact refresh (PARITY/PLANS/QUERIES.md/bench) in one
# command — see tools/close_round.py.
#   make close-round ROUND=8
ROUND ?= 0
SF ?= sf0.01

.PHONY: close-round test
close-round:
	python tools/close_round.py $(ROUND) --sf $(SF)

test:
	python -m pytest tests/ -q
