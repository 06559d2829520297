SELECT MIN(n.name) AS voicing_actress, MIN(t.title) AS jap_engl_voiced_movie
FROM aka_name an, char_name chn, cast_info ci, company_name cn, info_type it,
     movie_companies mc, movie_info mi, name n, role_type rt, title t
WHERE ci.note = '(voice)' AND cn.country_code = '[us]' AND it.info = 'release dates'
  AND mi.info IS NOT NULL AND (mi.info LIKE 'Japan:%200%' OR mi.info LIKE 'USA:%200%')
  AND n.gender = 'f' AND n.name LIKE '%An%' AND rt.role = 'actress'
  AND t.production_year > 2000
  AND t.id = mi.movie_id AND t.id = mc.movie_id AND t.id = ci.movie_id
  AND mc.movie_id = ci.movie_id AND mc.movie_id = mi.movie_id AND mi.movie_id = ci.movie_id
  AND cn.id = mc.company_id AND it.id = mi.info_type_id AND n.id = ci.person_id
  AND rt.id = ci.role_id AND n.id = an.person_id AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id;
