SELECT MIN(an.name) AS writer_pseudo_name, MIN(t.title) AS movie_title
FROM aka_name an, cast_info ci, company_name cn, movie_companies mc, name n, role_type rt, title t
WHERE cn.country_code = '[us]' AND rt.role = 'writer'
  AND an.person_id = n.id AND n.id = ci.person_id AND ci.movie_id = t.id
  AND t.id = mc.movie_id AND mc.company_id = cn.id AND ci.role_id = rt.id
  AND an.person_id = ci.person_id AND ci.movie_id = mc.movie_id;
