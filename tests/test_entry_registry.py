

def test_no_duplicate_registration_keys():
    """A duplicate literal key in a queries()/oracle_sql() dict silently
    shadows a registration (the r13 dedup_containment collision) — scan
    every source dict for repeated string keys."""
    import ast
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bad = []
    files = glob.glob(
        os.path.join(root, "elasticsearch_drift_plugin_spark/**/*.py"),
        recursive=True,
    ) + [os.path.join(root, "__spark_entry__.py")]
    for f in files:
        tree = ast.parse(open(f).read())
        for node in ast.walk(tree):
            if isinstance(node, ast.Dict):
                keys = [
                    k.value
                    for k in node.keys
                    if isinstance(k, ast.Constant) and isinstance(k.value, str)
                ]
                dups = sorted({k for k in keys if keys.count(k) > 1})
                if dups:
                    bad.append((os.path.relpath(f, root), node.lineno, dups))
    assert not bad, f"duplicate dict keys shadow registrations: {bad}"
