-- SF-PINNED snapshot oracle (20 rows at the driver gate
-- SF, sf0.01): a committed regression pin of a deterministic but
-- non-SQL-expressible output. Regenerate ONLY after a deliberate
-- semantic change: scripts/gen_sf_snapshot.py <verifyOut> t_heavy_hitters
WITH t(term, est_count) AS (VALUES
('agg', 901),
('batch', 937),
('column', 934),
('customer', 934),
('data', 908),
('filter', 933),
('hash', 947),
('join', 964),
('key', 896),
('line', 910),
('merge', 918),
('order', 912),
('row', 943),
('scan', 936),
('slow', 918),
('small', 928),
('stream', 888),
('table', 908),
('value', 897),
('vector', 912))
SELECT CAST(term AS VARCHAR) AS term, CAST(est_count AS BIGINT) AS est_count FROM t ORDER BY ALL