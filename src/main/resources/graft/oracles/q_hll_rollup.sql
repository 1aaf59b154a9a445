-- SF-PINNED snapshot oracle (1 rows at the driver gate
-- SF, sf0.01): a committed regression pin of a deterministic but
-- non-SQL-expressible output. Regenerate ONLY after a deliberate
-- semantic change: scripts/gen_sf_snapshot.py <verifyOut> q_hll_rollup
WITH t(est_users, n_days) AS (VALUES
(150, 30))
SELECT CAST(est_users AS BIGINT) AS est_users, CAST(n_days AS BIGINT) AS n_days FROM t ORDER BY ALL