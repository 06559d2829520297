SELECT chn.name AS character_name, COUNT(*) AS n_portrayals
FROM char_name chn, cast_info ci, title t
WHERE chn.id = ci.person_role_id AND t.id = ci.movie_id
  AND t.production_year > 1990
GROUP BY chn.name
HAVING COUNT(*) > 1
ORDER BY n_portrayals DESC, character_name
LIMIT 15;
