"""Shared helpers for kernel tests."""

from collections import ChainMap

from rdf_mapper_ray.kernel.evaluator import EvalState
from rdf_mapper_ray.kernel.spec import MapperSpec

DUMMY = MapperSpec({"globals": {"$datasetID": "testds"}})


def mkstate(ctx: dict, spec: MapperSpec = None) -> EvalState:
    spec = spec or DUMMY
    return EvalState(spec, spec.context.new_child(dict(ctx)))


def bare_state(ctx: dict, spec: MapperSpec = None) -> EvalState:
    spec = spec or MapperSpec()
    return EvalState(spec, ChainMap(dict(ctx)))
