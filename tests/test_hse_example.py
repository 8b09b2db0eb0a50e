"""End-to-end realism: the reference's HSE example (stage 4, the richest
lark-free template) over its shipped sample data, through both the local
kernel and the distributed Ray pipeline.

Exercises surfaces no synthetic fixture covers together: YAML property
imports + propspecs with type rewrites, sha1 <hash(...)> URIs over messy
keys ("MAPP (Reg.) Number:"), one_offs with cross-resource backrefs
(<::HSE>, <::AgriProduct>), inverse propspec (^:registration), bare
autoCV (cv name from $prop), dd/mm/yyyy dates, asBoolean, transposed
properties ("Crops:": ""), auto_declare, unknown-stanza tolerance.
"""

import json

import pytest

HSE_DIR = "/root/reference/examples/hse"
TEMPLATE = f"{HSE_DIR}/templates/4-local-CVs.yaml"

AGVOC = "https://data.agrimetrics.co.uk/def/"


@pytest.fixture(scope="module")
def hse_rows():
    with open(f"{HSE_DIR}/hse-sample.json", encoding="utf-8") as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _kernel_quads(rows):
    from rdf_mapper_ray.kernel.processor import RowProcessor
    from rdf_mapper_ray.kernel.spec import load_template
    spec = load_template(open(TEMPLATE, encoding="utf-8"),
                         auto_declare=True,
                         search_paths=(f"{HSE_DIR}/templates",))
    proc = RowProcessor(spec, filename="hse-sample")
    proc.process_rows(rows)
    return proc, {q.key() for q in proc.quads()}


def test_hse_stage4_kernel(hse_rows):
    proc, keys = _kernel_quads(hse_rows)
    assert proc.error_count == 0
    preds = {k[3] for k in keys}
    # propspec-imported predicates present
    assert AGVOC + "registrationNo" in preds
    assert AGVOC + "authorisationDate" in preds
    # dd/mm/yyyy parsed day-first as xsd:date
    dates = [k for k in keys if k[3] == AGVOC + "authorisationDate"]
    assert all(k[7].endswith("#date") for k in dates)
    import re
    assert all(re.fullmatch(r"\d{4}-\d{2}-\d{2}", k[5]) for k in dates)
    # sha1 <hash(...)> URIs: base32hex segment in the data namespace
    regs = {k[0:2] for k in keys if k[3] == AGVOC + "registrationNo"}
    assert all(re.search(r"/data/HSERegistration/[0-9A-V]{32}$", s)
               for (_g, s) in regs)
    # one_off backref: registrationAuthority -> the single HSE org node
    auth = {k[5] for k in keys
            if k[3] == AGVOC + "registrationAuthority"}
    assert len(auth) == 1
    # inverse propspec: (product, agvoc:registration, registration)
    inv = [k for k in keys if k[3] == AGVOC + "registration"
           and "/AgriProduct/" in k[1]]
    assert inv
    # bare autoCV minted concept schemes named after the property
    schemes = {k[1] for k in keys if k[3].endswith("#hasTopConcept")}
    assert any(s.endswith("/def/formulation_scheme") for s in schemes)
    assert any(s.endswith("/def/use_scheme") for s in schemes)
    # asBoolean produced typed booleans
    bools = [k for k in keys if k[3].endswith("/aquaticUse")]
    assert bools and all(k[5] in ("true", "false") for k in bools)


def test_hse_stage4_ray_matches_kernel(ray_session, hse_rows, tmp_path):
    """The distributed pipeline (JSON-lines source → extract actors →
    dedup) produces exactly the kernel's quad set."""
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    from rdf_mapper_ray.engine.sources import read_jsonlines_rows
    from rdf_mapper_ray.kernel.spec import load_template

    src = tmp_path / "hse-sample.jsonl"
    src.write_text("\n".join(json.dumps(r) for r in hse_rows))
    spec = load_template(open(TEMPLATE, encoding="utf-8"),
                         auto_declare=True,
                         search_paths=(f"{HSE_DIR}/templates",))
    pipe = KGPipeline(spec, canonicalize=False)
    out = pipe.run(read_jsonlines_rows(str(src)))
    ray_keys = {tuple(r) for r in out.to_pandas().itertuples(index=False)}
    _proc, kernel_keys = _kernel_quads(hse_rows)
    assert ray_keys == kernel_keys


@pytest.mark.parametrize("template", [
    "1-as-is.yaml", "2-reuse-registration.yaml", "3-split-products.yaml",
    "simplemap.yaml", "multi-resource.yaml", "property-resuse.yaml"])
def test_hse_other_templates_run_clean(template, hse_rows):
    """Every lark-free HSE template processes the sample corpus with zero
    errors and deterministic output."""
    from rdf_mapper_ray.kernel.processor import RowProcessor
    from rdf_mapper_ray.kernel.spec import load_template
    tdir = f"{HSE_DIR}/templates"
    spec = load_template(open(f"{tdir}/{template}", encoding="utf-8"),
                         auto_declare=True, search_paths=(tdir,))
    proc = RowProcessor(spec, filename="hse-sample")
    proc.process_rows(hse_rows)
    assert proc.error_count == 0
    assert len(proc.quads()) > 50
