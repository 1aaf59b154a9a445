-- SF-PINNED snapshot oracle (1 rows at the driver gate
-- SF, sf0.01): a committed regression pin of a deterministic but
-- non-SQL-expressible output. Regenerate ONLY after a deliberate
-- semantic change: scripts/gen_sf_snapshot.py <verifyOut> q_uniq_approx
WITH t(approx_users) AS (VALUES
(150))
SELECT CAST(approx_users AS BIGINT) AS approx_users FROM t ORDER BY ALL