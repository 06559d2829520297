SELECT MIN(chn.name) AS uncredited_voiced_character, MIN(t.title) AS russian_movie
FROM char_name chn, cast_info ci, company_name cn, company_type ct, movie_companies mc, role_type rt, title t
WHERE ci.note LIKE '%(voice)%' AND ci.note LIKE '%(uncredited)%'
  AND cn.country_code = '[ru]' AND rt.role = 'actor' AND t.production_year > 2005
  AND t.id = mc.movie_id AND t.id = ci.movie_id AND ci.movie_id = mc.movie_id
  AND chn.id = ci.person_role_id AND rt.id = ci.role_id AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id;
