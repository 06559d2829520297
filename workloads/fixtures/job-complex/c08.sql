SELECT rt.role AS cast_role, COUNT(*) AS n_credits
FROM role_type rt, cast_info ci, title t
WHERE t.production_year > 2005 AND rt.id = ci.role_id AND t.id = ci.movie_id
GROUP BY rt.role
HAVING COUNT(*) > 3
ORDER BY n_credits DESC, cast_role;
